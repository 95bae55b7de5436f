"""Model registry.

Maps the reference's string registries (SceneFlow/models/__init__.py:5-8,
KITTI12/models/__init__.py:5-9) into one namespace.
"""

from diffuvolume_tpu.models.acv import ACVNet

MODELS = {
    "acvnet": lambda max_disp=192, **kw: ACVNet(max_disp=max_disp, diffusion=False, **kw),
    "acvnet_ddim": lambda max_disp=192, **kw: ACVNet(max_disp=max_disp, diffusion=True, **kw),
}


def build_model(name: str, **kwargs):
    return MODELS[name](**kwargs)
