from gavit_tpu.data.dataset import (  # noqa: F401
    DISEASE_NAMES,
    ChestXrayDataset,
    PackedChestXrayDataset,
    SyntheticChestXrayDataset,
)
from gavit_tpu.data.loader import DataLoader, device_iterator  # noqa: F401
