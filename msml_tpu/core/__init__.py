from msml_tpu.core.config import Config, config_init, load_yaml, default_config
from msml_tpu.core.mesh import make_mesh, local_batch_size
from msml_tpu.core.precision import Policy, DEFAULT_POLICY
