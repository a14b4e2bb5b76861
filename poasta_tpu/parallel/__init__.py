from .mapper import BatchMapper, make_mesh, make_sharded_score_fn

__all__ = ["BatchMapper", "make_mesh", "make_sharded_score_fn"]
