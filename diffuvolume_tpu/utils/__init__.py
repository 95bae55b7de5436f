from diffuvolume_tpu.utils.meters import AverageMeter, AverageMeterDict
from diffuvolume_tpu.utils.padding import InputPadder
