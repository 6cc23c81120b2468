from .build import build_partials, build_sketch, build_sketch_grouped, merge_partial_rows
from .joins import bloom_prefilter, bloom_runtime_filter_join
from .probe import probe_array_column, probe_key_column
from .partitioning import salted_repartition

__all__ = [
    "bloom_prefilter",
    "bloom_runtime_filter_join",
    "build_partials",
    "build_sketch",
    "build_sketch_grouped",
    "merge_partial_rows",
    "probe_array_column",
    "probe_key_column",
    "salted_repartition",
]
