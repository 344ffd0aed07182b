from cosig_tpu.render.renderer import Renderer

__all__ = ["Renderer"]
