"""RL training: on-device PPO actor-learner + networks + normalization."""

from brax_rodent_run_tpu.training import acting
from brax_rodent_run_tpu.training import distribution
from brax_rodent_run_tpu.training import losses
from brax_rodent_run_tpu.training import networks
from brax_rodent_run_tpu.training import ppo
from brax_rodent_run_tpu.training import running_statistics
