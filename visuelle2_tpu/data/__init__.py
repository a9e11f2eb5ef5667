from visuelle2_tpu.data.pipeline import (
    Visuelle2Arrays,
    clean_restocked_sales,
    frame_series,
    extract_gtrends,
    temporal_features_from_dates,
    encode_attributes,
    load_visuelle2,
    preprocess_dataframe,
)
from visuelle2_tpu.data.images import ImageStore, IMAGE_SIZE, IMAGENET_MEAN, IMAGENET_STD
from visuelle2_tpu.data.synthetic import make_synthetic_dataset
from visuelle2_tpu.data.loader import BatchLoader, shard_batch

__all__ = [
    "Visuelle2Arrays",
    "clean_restocked_sales",
    "frame_series",
    "extract_gtrends",
    "temporal_features_from_dates",
    "encode_attributes",
    "load_visuelle2",
    "preprocess_dataframe",
    "ImageStore",
    "IMAGE_SIZE",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "make_synthetic_dataset",
    "BatchLoader",
    "shard_batch",
]
