from pybabe_spark.plans.facade import Babe

__all__ = ["Babe"]
