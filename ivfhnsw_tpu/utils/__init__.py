from ivfhnsw_tpu.utils.timer import StopW  # noqa: F401
from ivfhnsw_tpu.utils import io  # noqa: F401
