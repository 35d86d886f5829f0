"""I/O: param/train-state checkpointing."""

from brax_rodent_run_tpu.io.checkpoint import (
    load_params, load_train_state, save_params, save_train_state)
