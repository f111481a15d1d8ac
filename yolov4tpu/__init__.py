"""yolov4tpu — a TPU-native (JAX/XLA/Pallas) YOLOv4 framework.

Re-implements the full capability surface of taipingeric/yolo-v4-tf.keras
(model, loss, data pipeline, darknet weight import, training, inference,
mAP evaluation) with a functional, shardable, jit-first design.
"""

from .config import DEFAULT_CONFIG, YoloConfig  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy heavy imports so `import yolov4tpu` stays cheap.
    if name == "Yolov4":
        from .api import Yolov4
        return Yolov4
    if name == "serving":
        # importlib, NOT `from . import serving`: the latter resolves the
        # name via getattr on this package and would re-enter __getattr__.
        import importlib
        return importlib.import_module(".serving", __name__)
    raise AttributeError(name)
