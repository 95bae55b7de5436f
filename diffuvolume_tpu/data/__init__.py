from diffuvolume_tpu.data.readers import read_pfm, read_kitti_disparity, read_image
from diffuvolume_tpu.data.sceneflow import SceneFlowDataset, IMAGENET_MEAN, IMAGENET_STD
