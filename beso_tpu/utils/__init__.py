from beso_tpu.utils.config import Config, load_config
from beso_tpu.utils.metrics import MetricsWriter, make_metrics_writer
