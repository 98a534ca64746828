from ttnx.parallel.batch import (  # noqa: F401
    batched_als_linsolve,
    batched_als_sweeps,
    make_mesh,
    shard_batched_problem,
)
from ttnx.parallel.round_dist import (  # noqa: F401
    gram_chain_round_dist,
    gram_round_dist,
    make_cn_step_dist,
    shard_chain,
    tp_rounding_worthwhile,
)
