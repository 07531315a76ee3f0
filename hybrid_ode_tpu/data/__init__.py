from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
from hybrid_ode_tpu.data.dataset import (
    GlucoseDataset,
    create_data_arrays,
    split_dataset,
    batch_iterator,
)

__all__ = [
    "generate_4gi_dataset",
    "GlucoseDataset",
    "create_data_arrays",
    "split_dataset",
    "batch_iterator",
]
