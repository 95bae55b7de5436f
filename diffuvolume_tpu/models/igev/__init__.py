from diffuvolume_tpu.models.igev.model import IGEVStereo
from diffuvolume_tpu.models.igev.geometry import GeoPyramid, build_geo_pyramid, geo_lookup
