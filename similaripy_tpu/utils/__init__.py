from .env import default_backend, on_tpu
from .progress import ProgressBar
