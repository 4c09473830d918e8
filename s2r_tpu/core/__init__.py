from s2r_tpu.core.mesh import make_mesh, batch_sharding, replicated_sharding
from s2r_tpu.core.precision import Policy
