from .encode import encode_labels_jax, preprocess_true_boxes  # noqa: F401
from .pipeline import DataGenerator, prefetch  # noqa: F401
