from msml_tpu.kernels.augment import (device_gauss_light, device_random_block,
                                      device_augment_batch,
                                      pallas_gauss_block_available)
