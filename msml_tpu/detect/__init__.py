"""Bundled face detection for raw-dataset alignment (MTCNN cascade)."""

from msml_tpu.detect.mtcnn import MTCNN, load_mtcnn_weights  # noqa: F401
