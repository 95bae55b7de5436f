"""Model registry.

Maps the reference's string registries (SceneFlow/models/__init__.py:5-8,
KITTI12/models/__init__.py:5-9, KITTI15 direct import) into one namespace.
"""

from diffuvolume_tpu.models.acv import ACVNet
from diffuvolume_tpu.models.pcw import PCWNet


def _igev(**kw):
    from diffuvolume_tpu.models.igev.model import IGEVStereo

    return IGEVStereo(**kw)


MODELS = {
    "acvnet": lambda max_disp=192, **kw: ACVNet(max_disp=max_disp, diffusion=False, **kw),
    "acvnet_ddim": lambda max_disp=192, **kw: ACVNet(max_disp=max_disp, diffusion=True, **kw),
    # the reference registers PCWNet as 'gwcnet-g'/'gwcnet-gc'
    # (KITTI12/models/__init__.py:5-9)
    "gwcnet-g": lambda max_disp=192, **kw: PCWNet(max_disp=max_disp, diffusion=False,
                                                  use_concat_volume=False, **kw),
    "gwcnet-gc": lambda max_disp=192, **kw: PCWNet(max_disp=max_disp, diffusion=False,
                                                   use_concat_volume=True, **kw),
    "pcwnet_ddim": lambda max_disp=192, **kw: PCWNet(max_disp=max_disp, diffusion=True, **kw),
    "igev": lambda max_disp=192, **kw: _igev(max_disp=max_disp, diffusion=False, **kw),
    "igev_ddim": lambda max_disp=192, **kw: _igev(max_disp=max_disp, diffusion=True, **kw),
}


def build_model(name: str, **kwargs):
    return MODELS[name](**kwargs)
