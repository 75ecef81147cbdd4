from .config import Config, export_config, load_config, parse_cli
from .checkpoint import latest_checkpoint, load_checkpoint, restore_params, save_checkpoint
from .optim import build_lr_tree, fast_forward_schedule, make_optimizer
