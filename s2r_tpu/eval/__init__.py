from s2r_tpu.eval.metrics import Evaluator, confusion_matrix
