from cvnets_tpu.engine.training_engine import Trainer
from cvnets_tpu.engine.evaluation_engine import Evaluator
