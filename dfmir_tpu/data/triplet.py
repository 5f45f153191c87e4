"""``--dataset_mode triplet`` registry module (class lives with its
sibling in patient_site.py)."""

from dfmir_tpu.data.patient_site import TripletDataset

__all__ = ["TripletDataset"]
