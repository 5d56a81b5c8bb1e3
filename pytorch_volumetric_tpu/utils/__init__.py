from pytorch_volumetric_tpu.utils.batching import (
    as_float_array, flatten_batch, cdiv, round_up, pad_to, np_pad_to,
)
from pytorch_volumetric_tpu.utils.cache import NpzStore, get_store
from pytorch_volumetric_tpu.utils.debug import checked_query, guarded_raw_query
