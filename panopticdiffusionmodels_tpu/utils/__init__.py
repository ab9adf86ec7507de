from .logging import set_logger, dct2str
from .misc import amortize, cnt_params, one_deep
