from dfmir_tpu.engine.config import RegistrationConfig
from dfmir_tpu.engine.registration import RegistrationModel, TrainState, grid_image
from dfmir_tpu.engine.schedules import LRSchedule
from dfmir_tpu.engine.vxm_engine import VxmConfig, VxmEngine, VxmState

__all__ = ["RegistrationConfig", "RegistrationModel", "TrainState",
           "LRSchedule", "grid_image", "VxmConfig", "VxmEngine", "VxmState"]
