from .tt_shapes import TTShapes, make_tt_shapes, suggested_tt_shapes, prime_factors, factor_combinations
from .tt_lookup import (
    tt_digits,
    tt_to_full,
    tt_lookup,
    tt_lookup_gather,
    tt_lookup_grouped,
    tt_lookup_grouped_sorted,
    tt_embedding_bag,
    tt_core_grads,
    tt_materialize_rows,
)
from . import tt_init
from .tt_pallas import (
    tt_lookup_pallas,
    tt_lookup_pallas_padded,
    tt_grads_pallas,
    tt_lookup_fused,
    tt_fused_sgd_pallas,
)
from .tt_lookup import tt_lookup_batched
from . import cache, segment, spmm_blocked
