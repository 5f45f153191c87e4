from dfmir_tpu.data.image_folder import IMG_EXTENSIONS, is_image_file, make_dataset
from dfmir_tpu.data.loader import (
    DataLoader, create_dataset, find_dataset_using_name, get_option_setter,
    prefetch_to_device,
)
from dfmir_tpu.data.transforms import (
    TransformParams, apply_transform, get_params, to_array,
)
from dfmir_tpu.data.unaligned import UnalignedDataset
from dfmir_tpu.data.volume import VolumeDataset

__all__ = [
    "IMG_EXTENSIONS", "is_image_file", "make_dataset",
    "DataLoader", "create_dataset", "find_dataset_using_name",
    "get_option_setter", "prefetch_to_device",
    "TransformParams", "apply_transform", "get_params", "to_array",
    "UnalignedDataset", "VolumeDataset",
]
