from corral_spark.mapreduce.api import (
    Driver,
    Emitter,
    Job,
    Mapper,
    MultiStageDriver,
    Reducer,
    ValueIterator,
    fnv64a_partition,
)

__all__ = [
    "Driver",
    "Emitter",
    "Job",
    "Mapper",
    "MultiStageDriver",
    "Reducer",
    "ValueIterator",
    "fnv64a_partition",
]
