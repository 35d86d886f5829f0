"""brax_rodent_run_tpu: a TPU-native rodent-locomotion RL framework.

A from-scratch rebuild of the capabilities of talmolab/Brax-Rodent-Run
(reference layer map in /root/repo/SURVEY.md), designed TPU-first:

- ``mjcf``:          MJCF model compiler -> immutable struct-of-arrays ``Model``
- ``physics``:       generalized-coordinate rigid-body pipeline (pure JAX, jit/vmap)
- ``envs``:          batched RL environments (Rodent tracking task, Humanoid)
- ``preprocessing``: mocap clip -> ReferenceClip tracking targets
- ``training``:      on-device PPO actor-learner (single fused train step)
- ``parallel``:      mesh / shard_map scaling over TPU slices
- ``ops``:           Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"
