"""Run-directory management, logging, checkpointing, evaluation harnesses."""
from apex_tpu.runtime.log import create_logger, parse_previous
from apex_tpu.runtime.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["create_logger", "parse_previous", "save_checkpoint", "load_checkpoint"]
