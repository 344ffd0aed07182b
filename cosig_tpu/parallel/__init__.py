from cosig_tpu.parallel.sharding import render_sharded, make_mesh

__all__ = ["render_sharded", "make_mesh"]
