"""Per-campaign file logger.

(reference: active_learning_loop/logging.py:15-54)
"""

import logging
import os


def set_up_campaign_logger(working_directory: str) -> logging.Logger:
    """A logger writing to <working_directory>/campaign.log."""
    os.makedirs(working_directory, exist_ok=True)
    logger = logging.getLogger(f"campaign:{working_directory}")
    logger.setLevel(logging.INFO)
    handler = logging.FileHandler(os.path.join(working_directory, "campaign.log"))
    handler.setFormatter(
        logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    )
    logger.addHandler(handler)
    stream = logging.StreamHandler()
    stream.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(stream)
    return logger


def clean_up_campaign_logger(logger: logging.Logger) -> None:
    """Remove handlers so later campaigns do not double-log."""
    for handler in list(logger.handlers):
        handler.close()
        logger.removeHandler(handler)
