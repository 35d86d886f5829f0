"""Static kinematic-tree structure masks, precomputed on host.

The classic Featherstone recursions (CRB, com velocity, RNE) are sequential
tree traversals in C implementations. On TPU we replace every traversal whose
dependency is a *sum over ancestors/subtree* with a dense matmul against a
static 0/1 mask — one MXU op over the whole env batch instead of nbody
sequential steps. Only forward kinematics keeps a (level-parallel) loop,
because child frames compose nonlinearly with parents.

Masks are tiny ((nbody|nv)^2 ~ 73^2) and cached per Model instance.
"""

from __future__ import annotations

import functools

import numpy as np

from brax_rodent_run_tpu.physics.types import Model


class TreeMasks:
  """Precomputed structure masks for a Model (host numpy, float32)."""

  def __init__(self, m: Model):
    nbody, nv = m.nbody, m.nv

    # body ancestor-or-self matrix: anc[i, j] = 1 if j is ancestor-or-self of i
    anc = np.zeros((nbody, nbody), np.float32)
    for i in range(nbody):
      j = i
      while j >= 0:
        anc[i, j] = 1.0
        j = int(m.body_parentid[j]) if j != 0 else -1
    self.body_ancestor = anc
    # subtree[i, j] = 1 if j is in subtree rooted at i  (transpose of ancestor)
    self.body_subtree = anc.T.copy()

    # dof ancestor chains via dof_parentid
    dof_anc_strict = np.zeros((nv, nv), np.float32)
    for j in range(nv):
      k = int(m.dof_parentid[j])
      while k >= 0:
        dof_anc_strict[j, k] = 1.0
        k = int(m.dof_parentid[k])
    self.dof_ancestor = dof_anc_strict + np.eye(nv, dtype=np.float32)

    # cdof_dot mask: like strict ancestors, but rotational dof triples of
    # free/ball joints form a block — each block dof crosses with the
    # velocity accumulated BEFORE the block (mj_comVel semantics).
    cdofdot_mask = dof_anc_strict.copy()
    from brax_rodent_run_tpu.physics.types import JointType
    for j in range(m.njnt):
      jt = int(m.jnt_type[j])
      if jt == JointType.FREE:
        rot = range(int(m.jnt_dofadr[j]) + 3, int(m.jnt_dofadr[j]) + 6)
      elif jt == JointType.BALL:
        rot = range(int(m.jnt_dofadr[j]), int(m.jnt_dofadr[j]) + 3)
      else:
        continue
      for a in rot:
        for b in rot:
          cdofdot_mask[a, b] = 0.0
    self.cdof_dot_mask = cdofdot_mask

    # body_dof[b, j] = 1 if dof j belongs to an ancestor-or-self body of b
    body_dof = np.zeros((nbody, nv), np.float32)
    for b in range(nbody):
      for j in range(nv):
        if anc[b, int(m.dof_bodyid[j])]:
          body_dof[b, j] = 1.0
    self.body_dof_ancestor = body_dof

    # qM sparsity: mask[i, j] = 1 if dof i is ancestor-or-self of dof j
    self.qm_upper = self.dof_ancestor.T.copy()  # (i ancestor of j) at [i, j]

    # FK levels: bodies grouped by tree depth (world = level 0 excluded)
    depth = np.zeros(nbody, np.int64)
    for i in range(1, nbody):
      depth[i] = depth[int(m.body_parentid[i])] + 1
    self.levels = [
        np.nonzero(depth == d)[0].astype(np.int64)
        for d in range(1, int(depth.max()) + 1)
    ] if nbody > 1 else []


@functools.lru_cache(maxsize=64)
def masks(m: Model) -> TreeMasks:
  return TreeMasks(m)
