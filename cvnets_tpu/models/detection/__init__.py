from collections import namedtuple

# (labels, scores, boxes, masks) — parity: reference cvnets/models/detection
# DetectionPredTuple
DetectionPredTuple = namedtuple(
    "DetectionPredTuple", ["labels", "scores", "boxes", "masks"],
    defaults=(None,),
)
