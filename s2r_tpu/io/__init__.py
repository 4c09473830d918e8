from s2r_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from s2r_tpu.io.saver import Saver
