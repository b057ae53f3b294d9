"""Etag-keyed local file cache for driver-staged remote pulls — the
reference's s3 download cache (pybabe/protocol_s3.py:89-111: cached
file named ``basename-etag``, hit skips the download, miss fetches to
``*.tmp`` then atomically renames) + its FileCache sweeper
(pybabe/filecache.py:1-35, whose size-limit cleanup was unfinished —
implemented here: trim to the limit oldest-modified-first).

The engine reads distributed stores (``s3a://``, ``hdfs://``)
executor-side, where no driver cache applies; this cache serves the
single-file URL fetch path (``pull('http(s)://…', 'ftp://…')``), which
is the Spark-first analog of the reference's driver-side s3 pull. The
remote object's etag comes from the injectable ``io.URL_STAT`` seam —
when the etag is unknown the cache is bypassed (a cache that can't
validate change would serve stale data silently).
"""

from __future__ import annotations

import os

TMP_SUFFIX = ".fetch.tmp"


class FileCache:
    """Content-addressed download cache: ``lookup(name, fetch_cb)``
    returns the cached file when present, else runs ``fetch_cb(tmp)``
    and atomically renames the result in. ``name`` must embed the
    remote version (``basename-etag``) so a changed object misses."""

    def __init__(self, cache_dir: str, size_limit: int | None = None):
        self.cache_dir = cache_dir
        self.size_limit = size_limit
        os.makedirs(cache_dir, exist_ok=True)

    def path_for(self, name: str) -> str:
        safe = name.replace("/", "_").replace("\\", "_")
        return os.path.join(self.cache_dir, safe)

    def has(self, name: str) -> bool:
        return os.path.exists(self.path_for(name))

    def lookup(self, name: str, fetch_callback) -> str:
        """Cached path for ``name``; on miss, ``fetch_callback(tmp_path)``
        must write the file, which is then renamed in atomically (a
        crashed fetch leaves only a ``*.fetch.tmp`` the next cleanup
        sweeps)."""
        f = self.path_for(name)
        if os.path.exists(f):
            return f
        tmp = f + TMP_SUFFIX
        try:
            fetch_callback(tmp)
            os.replace(tmp, f)
        finally:
            if os.path.exists(tmp):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        self.cleanup()
        return f

    def cleanup(self) -> None:
        """Remove stray ``*.fetch.tmp`` debris, then trim the cache to
        ``size_limit`` bytes by deleting oldest-modified files first
        (the policy pybabe/filecache.py:23-35 sketched but never
        implemented)."""
        entries = []
        total = 0
        for fn in os.listdir(self.cache_dir):
            p = os.path.join(self.cache_dir, fn)
            if not os.path.isfile(p):
                continue
            if fn.endswith(TMP_SUFFIX):
                try:
                    os.unlink(p)
                except OSError:
                    pass
                continue
            try:
                st = os.stat(p)
            except OSError:
                continue
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
        if self.size_limit is None or total <= self.size_limit:
            return
        for _, size, p in sorted(entries):
            try:
                os.unlink(p)
                total -= size
            except OSError:
                pass
            if total <= self.size_limit:
                return
