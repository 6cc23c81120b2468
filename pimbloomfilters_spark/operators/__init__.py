from .build import build_partials, build_sketch, build_sketch_grouped, merge_partial_rows
from .joins import bloom_prefilter, bloom_runtime_filter_join
from .probe import probe_array_column, probe_key_column, register_sql_functions
from .partitioning import salted_repartition
from .sampling import (
    mixture_sample,
    mixture_sample_tokens,
    stratified_sample,
    uniform_sample,
    weighted_sample,
)

__all__ = [
    "bloom_prefilter",
    "bloom_runtime_filter_join",
    "build_partials",
    "build_sketch",
    "build_sketch_grouped",
    "merge_partial_rows",
    "mixture_sample",
    "mixture_sample_tokens",
    "probe_array_column",
    "probe_key_column",
    "register_sql_functions",
    "salted_repartition",
    "stratified_sample",
    "uniform_sample",
    "weighted_sample",
]
