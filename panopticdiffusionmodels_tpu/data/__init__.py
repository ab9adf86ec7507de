from .datasets import get_dataset, DatasetFactory
from .loader import Loader, prefetch_to_device
