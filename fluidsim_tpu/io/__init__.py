from .checkpoint import save_checkpoint, load_checkpoint, save_config, load_config
