from cdae_tpu.parallel.mesh import make_mesh, cdae_param_specs, batch_specs
from cdae_tpu.parallel.topk import distributed_topk_unrated

__all__ = [
    "make_mesh",
    "cdae_param_specs",
    "batch_specs",
    "distributed_topk_unrated",
    "ShardedCDAE",
    "ShardedIMF",
    "ShardedPairwise",
    "ShardedNegMF",
    "ShardedFISM",
    "ShardedALS",
    "ShardedWRMF",
    "ShardedPairwiseTP",
]


def __getattr__(name):  # lazy: trainer pulls in the model zoo
    if name in ("ShardedCDAE", "ShardedIMF", "ShardedPairwise",
                "ShardedNegMF", "ShardedFISM", "ShardedALS", "ShardedWRMF"):
        from cdae_tpu.parallel import trainer

        return getattr(trainer, name)
    if name == "ShardedPairwiseTP":
        from cdae_tpu.parallel.tp_pairwise import ShardedPairwiseTP

        return ShardedPairwiseTP
    raise AttributeError(name)
