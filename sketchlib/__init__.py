"""sketchlib — a PySpark-native distributed sketch / approximate-aggregation
library (HyperLogLog, count-min, Bloom, KLL, t-digest).

Built from scratch on the semantics of ascv/HyperLogLog (reference at
/root/reference, surveyed in SURVEY.md): MurmurHash64A keys, dense register
arrays, element-wise-max merge, bias-corrected estimator. The architecture is
idiomatic Spark — Arrow-batched partial sketches built with ``mapInArrow``,
tree-merged with ``groupBy(...).applyInPandas`` — never per-row Python.
"""

from .hll import HllSketch, estimate_from_histogram
from .kernels import (
    DEFAULT_SEED,
    murmur64a_bytes,
    murmur64a_int32,
    murmur64a_int64,
    vclz64,
)

__all__ = [
    "HllSketch",
    "estimate_from_histogram",
    "murmur64a_bytes",
    "murmur64a_int32",
    "murmur64a_int64",
    "vclz64",
    "DEFAULT_SEED",
]

__version__ = "0.1.0"
