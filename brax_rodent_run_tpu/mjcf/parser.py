"""Native MJCF compiler: XML -> immutable ``Model`` with no MuJoCo C
dependency.

The reference delegates model compilation to the MuJoCo C compiler
(``mujoco.MjModel.from_xml_path``, Rodent_Env_Brax.py:41); SURVEY.md §7
step 1 makes it a first-class component here. Scope is the MJCF surface
the reference's six models exercise (SURVEY.md §2.2): defaults-class
inheritance with childclass propagation, orientation specifiers
(quat/euler/axisangle/zaxis/xyaxes), fromto geoms, inertia-from-geom
density, <replicate> expansion incl. duplication of referencing
actuators/tendons/sensors/contacts, fixed tendons, general/motor/position
actuators, the five sensor types, contact pair/exclude blocks, keyframes,
and option/flag parsing.

Derived simulation constants (body/dof/tendon invweight0, tendon_length0,
actuator_acc0 — mj_setConst semantics) are computed by running our own
kinematics + CRB pipeline at qpos0 in float64.

Parity is enforced by tests/test_parser.py, which diffs every compiled
array against ``mujoco.MjModel`` for all reference models.
"""

from __future__ import annotations

import copy
import math
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from brax_rodent_run_tpu.physics.types import (
    BiasType, DisableBit, DynType, GainType, GeomType, JointType, Model,
    Option, SensorType, SolverType, TrnType)

# ---------------------------------------------------------------------------
# small math helpers (host numpy, float64)
# ---------------------------------------------------------------------------


def _floats(s: str) -> np.ndarray:
  return np.array([float(x) for x in s.split()], np.float64)


def _quat_mul(a, b):
  w1, x1, y1, z1 = a
  w2, x2, y2, z2 = b
  return np.array([
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
  ])


def _axis_angle_quat(axis, angle):
  axis = np.asarray(axis, np.float64)
  n = np.linalg.norm(axis)
  if n < 1e-14:
    return np.array([1.0, 0, 0, 0])
  axis = axis / n
  s = math.sin(angle / 2)
  return np.array([math.cos(angle / 2), *(axis * s)])


def _quat_to_mat(q):
  w, x, y, z = q
  return np.array([
      [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
      [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
      [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
  ])


def _mat_to_quat(R):
  tr = R[0, 0] + R[1, 1] + R[2, 2]
  if tr > 0:
    s = math.sqrt(tr + 1.0) * 2
    q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                  (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
  elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
    s = math.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
    q = np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                  (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
  elif R[1, 1] > R[2, 2]:
    s = math.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
    q = np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                  0.25 * s, (R[1, 2] + R[2, 1]) / s])
  else:
    s = math.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
    q = np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                  (R[1, 2] + R[2, 1]) / s, 0.25 * s])
  q = q / np.linalg.norm(q)
  if q[0] < 0:
    q = -q
  return q


def _zaxis_quat(z):
  """Minimal rotation taking (0,0,1) to z (mju semantics)."""
  z = np.asarray(z, np.float64)
  z = z / max(np.linalg.norm(z), 1e-14)
  axis = np.cross([0.0, 0, 1], z)
  s = np.linalg.norm(axis)
  c = z[2]
  if s < 1e-14:
    if c > 0:
      return np.array([1.0, 0, 0, 0])
    return np.array([0.0, 1, 0, 0])   # 180deg about x
  angle = math.atan2(s, c)
  return _axis_angle_quat(axis, angle)


_AXES = {"x": np.array([1.0, 0, 0]), "y": np.array([0.0, 1, 0]),
         "z": np.array([0.0, 0, 1])}


def _orientation(attrs: Dict[str, str], angle_scale: float,
                 eulerseq: str = "xyz") -> np.ndarray:
  """Resolve quat/euler/axisangle/zaxis/xyaxes into a quaternion."""
  if "quat" in attrs:
    q = _floats(attrs["quat"])
    return q / np.linalg.norm(q)
  if "euler" in attrs:
    ang = _floats(attrs["euler"]) * angle_scale
    q = np.array([1.0, 0, 0, 0])
    for ax_name, a in zip(eulerseq, ang):
      r = _axis_angle_quat(_AXES[ax_name.lower()], a)
      if ax_name.islower():       # intrinsic: rotate in moving frame
        q = _quat_mul(q, r)
      else:                       # extrinsic: fixed frame
        q = _quat_mul(r, q)
    return q
  if "axisangle" in attrs:
    v = _floats(attrs["axisangle"])
    return _axis_angle_quat(v[:3], v[3] * angle_scale)
  if "zaxis" in attrs:
    return _zaxis_quat(_floats(attrs["zaxis"]))
  if "xyaxes" in attrs:
    v = _floats(attrs["xyaxes"])
    x = v[:3] / np.linalg.norm(v[:3])
    y = v[3:6] - x * np.dot(x, v[3:6])
    y = y / np.linalg.norm(y)
    z = np.cross(x, y)
    return _mat_to_quat(np.stack([x, y, z], axis=1))
  return np.array([1.0, 0, 0, 0])


# ---------------------------------------------------------------------------
# geom mass properties (user_objects.cc ComputeInertia semantics)
# ---------------------------------------------------------------------------

_GEOM_TYPES = {
    "plane": GeomType.PLANE, "hfield": GeomType.HFIELD,
    "sphere": GeomType.SPHERE, "capsule": GeomType.CAPSULE,
    "ellipsoid": GeomType.ELLIPSOID, "cylinder": GeomType.CYLINDER,
    "box": GeomType.BOX,
}


def geom_mass_inertia(gtype: int, size: np.ndarray, density: float,
                      mass: Optional[float]) -> Tuple[float, np.ndarray]:
  """(mass, diagonal inertia in the geom frame)."""
  r = float(size[0]) if len(size) else 0.0
  if gtype == GeomType.SPHERE:
    vol = 4.0 / 3.0 * math.pi * r ** 3
    m = mass if mass is not None else density * vol
    I = np.full(3, 0.4 * m * r * r)
  elif gtype == GeomType.CAPSULE:
    h = float(size[1])
    sph_vol = 4.0 / 3.0 * math.pi * r ** 3
    cyl_vol = math.pi * r * r * 2 * h
    vol = sph_vol + cyl_vol
    rho = (mass / vol) if mass is not None else density
    ms, mc = rho * sph_vol, rho * cyl_vol
    m = ms + mc
    iz = mc * 0.5 * r * r + ms * 0.4 * r * r
    ix = (mc * (r * r / 4 + h * h / 3)
          + ms * (0.4 * r * r + h * h + 3.0 / 8.0 * r * h * 2))
    I = np.array([ix, ix, iz])
  elif gtype == GeomType.CYLINDER:
    h = float(size[1])
    vol = math.pi * r * r * 2 * h
    m = mass if mass is not None else density * vol
    iz = 0.5 * m * r * r
    ix = m * (3 * r * r + 4 * h * h) / 12.0
    I = np.array([ix, ix, iz])
  elif gtype == GeomType.ELLIPSOID:
    a, b, c = [float(x) for x in size[:3]]
    vol = 4.0 / 3.0 * math.pi * a * b * c
    m = mass if mass is not None else density * vol
    I = 0.2 * m * np.array([b * b + c * c, a * a + c * c, a * a + b * b])
  elif gtype == GeomType.BOX:
    a, b, c = [float(x) for x in size[:3]]
    vol = 8.0 * a * b * c
    m = mass if mass is not None else density * vol
    I = m / 3.0 * np.array([b * b + c * c, a * a + c * c, a * a + b * b])
  else:  # plane/hfield: massless
    return 0.0, np.zeros(3)
  return float(m), I


# ---------------------------------------------------------------------------
# defaults tree
# ---------------------------------------------------------------------------

_DEFAULT_KINDS = ("joint", "geom", "site", "general", "motor", "position",
                  "velocity", "tendon", "pair", "camera", "mesh")


class Defaults:
  """MJCF default classes: nested inheritance, per-element-kind dicts."""

  def __init__(self):
    self.classes: Dict[str, Dict[str, Dict[str, str]]] = {
        "main": {k: {} for k in _DEFAULT_KINDS}}

  def parse(self, elem: ET.Element, parent: str = "main"):
    name = elem.get("class", "main" if parent == "main" else None)
    if name is None:
      raise ValueError("nested <default> must have a class name")
    base = {k: dict(v) for k, v in self.classes[parent].items()}
    for child in elem:
      if child.tag == "default":
        continue
      if child.tag in _DEFAULT_KINDS:
        base.setdefault(child.tag, {})
        base[child.tag].update(child.attrib)
    self.classes[name] = base
    for child in elem:
      if child.tag == "default":
        self.parse(child, name)

  def resolve(self, kind: str, elem: ET.Element,
              childclass: str = "main") -> Dict[str, str]:
    cls = elem.get("class", childclass)
    if cls not in self.classes:
      cls = "main"
    out = dict(self.classes[cls].get(kind, {}))
    # actuator shortcuts inherit <general> defaults under the hood
    if kind in ("motor", "position", "velocity"):
      merged = dict(self.classes[cls].get("general", {}))
      merged.update(out)
      out = merged
    out.update(elem.attrib)
    return out


# ---------------------------------------------------------------------------
# staging structures
# ---------------------------------------------------------------------------


class _Body:
  def __init__(self):
    self.name = ""
    self.parent = 0
    self.pos = np.zeros(3)
    self.quat = np.array([1.0, 0, 0, 0])
    self.joints: List[int] = []
    self.geoms: List[int] = []
    self.explicit_inertial = None  # (mass, ipos, iquat, diaginertia)


class _Joint:
  pass


class _Geom:
  pass


class _Site:
  pass


def _get(attrs, key, default=None):
  return attrs[key] if key in attrs else default


def _getf(attrs, key, default):
  if key in attrs:
    v = _floats(attrs[key])
    return v if len(v) > 1 else float(v[0])
  return default


def _vec(attrs, key, default) -> np.ndarray:
  """Fixed-size vector attribute; partial specs keep the default tail
  (MuJoCo semantics for solref/solimp/friction/...)."""
  out = np.array(default, np.float64)
  if key in attrs:
    v = _floats(attrs[key])
    out[:len(v)] = v[:len(out)]
  return out


class Parser:
  """One-shot MJCF -> Model compiler."""

  def __init__(self, root: ET.Element, path: str = ""):
    self.root = root
    self.path = path
    self.defaults = Defaults()
    self.angle_scale = math.pi / 180.0      # default angle="degree"
    self.eulerseq = "xyz"
    self.autolimits = True
    self.boundmass = 0.0
    self.boundinertia = 0.0

    self.bodies: List[_Body] = []
    self.joints: List[_Joint] = []
    self.geoms: List[_Geom] = []
    self.sites: List[_Site] = []
    self.cameras: List[str] = []
    self.tendons = []
    self.actuators = []
    self.sensors = []
    self.pairs = []
    self.excludes = []
    self.keyframes = []

  # -------------------------------------------------------------- top level
  def parse(self) -> Model:
    root = self.root
    for comp in root.findall("compiler"):
      if comp.get("angle") == "radian":
        self.angle_scale = 1.0
      if comp.get("eulerseq"):
        self.eulerseq = comp.get("eulerseq")
      if comp.get("autolimits") == "false":
        self.autolimits = False
      if comp.get("boundmass"):
        self.boundmass = float(comp.get("boundmass"))
      if comp.get("boundinertia"):
        self.boundinertia = float(comp.get("boundinertia"))

    for dflt in root.findall("default"):
      self.defaults.parse(dflt)

    opt = self._parse_option(root.find("option"))

    world = root.find("worldbody")
    wb = _Body()
    wb.name = "world"
    wb.parent = 0
    self.bodies.append(wb)
    self._parse_body_children(world, 0, "main")

    for contact in root.findall("contact"):
      for pair in contact.findall("pair"):
        self.pairs.append(self.defaults.resolve("pair", pair))
      for ex in contact.findall("exclude"):
        self.excludes.append((ex.get("body1"), ex.get("body2")))

    for tend in root.findall("tendon"):
      for fixed in tend.findall("fixed"):
        attrs = self.defaults.resolve("tendon", fixed)
        wraps = [(j.get("joint"), float(j.get("coef", "1")))
                 for j in fixed.findall("joint")]
        self.tendons.append((attrs, wraps))

    for act in root.findall("actuator"):
      for a in act:
        if a.tag in ("general", "motor", "position", "velocity"):
          self.actuators.append(
              (a.tag, self.defaults.resolve(a.tag, a)))

    _SENSORS = {"touch": SensorType.TOUCH,
                "accelerometer": SensorType.ACCELEROMETER,
                "velocimeter": SensorType.VELOCIMETER,
                "gyro": SensorType.GYRO,
                "subtreelinvel": SensorType.SUBTREELINVEL}
    for sens in root.findall("sensor"):
      for s in sens:
        if s.tag in _SENSORS:
          self.sensors.append((int(_SENSORS[s.tag]),
                               s.get("site") or s.get("body"),
                               s.get("name", "")))

    for key in root.findall("keyframe"):
      for k in key.findall("key"):
        self.keyframes.append((k.get("name", ""), k.get("qpos")))

    self._expand_replicated_refs()
    return self._assemble(opt)

  def _parse_option(self, elem) -> Option:
    kw = {}
    disable = 0
    if elem is not None:
      if elem.get("timestep"):
        kw["timestep"] = float(elem.get("timestep"))
      if elem.get("gravity"):
        kw["gravity"] = tuple(_floats(elem.get("gravity")).tolist())
      if elem.get("solver"):
        kw["solver"] = {"PGS": SolverType.PGS, "CG": SolverType.CG,
                        "Newton": SolverType.NEWTON}[elem.get("solver")]
      if elem.get("iterations"):
        kw["iterations"] = int(elem.get("iterations"))
      if elem.get("ls_iterations"):
        kw["ls_iterations"] = int(elem.get("ls_iterations"))
      if elem.get("tolerance"):
        kw["tolerance"] = float(elem.get("tolerance"))
      if elem.get("ls_tolerance"):
        kw["ls_tolerance"] = float(elem.get("ls_tolerance"))
      if elem.get("impratio"):
        kw["impratio"] = float(elem.get("impratio"))
      if elem.get("cone"):
        kw["cone"] = {"pyramidal": 0, "elliptic": 1}[elem.get("cone")]
      flag = elem.find("flag")
      if flag is not None:
        for nm, bit in (("constraint", DisableBit.CONSTRAINT),
                        ("equality", DisableBit.EQUALITY),
                        ("frictionloss", DisableBit.FRICTIONLOSS),
                        ("limit", DisableBit.LIMIT),
                        ("contact", DisableBit.CONTACT),
                        ("passive", DisableBit.PASSIVE),
                        ("spring", DisableBit.SPRING),
                        ("damper", DisableBit.DAMPER),
                        ("gravity", DisableBit.GRAVITY),
                        ("clampctrl", DisableBit.CLAMPCTRL),
                        ("warmstart", DisableBit.WARMSTART),
                        ("filterparent", DisableBit.FILTERPARENT),
                        ("actuation", DisableBit.ACTUATION),
                        ("refsafe", DisableBit.REFSAFE),
                        ("sensor", DisableBit.SENSOR),
                        ("eulerdamp", DisableBit.EULERDAMP)):
          if flag.get(nm) == "disable":
            disable |= int(bit)
    kw["disableflags"] = disable
    return Option(**kw)

  # ------------------------------------------------------------- body tree
  def _parse_body_children(self, elem: ET.Element, bodyid: int,
                           childclass: str):
    # two passes: a body's own joints/geoms/sites take ids BEFORE any
    # child body's, regardless of where they appear among the children
    # (MuJoCo id assignment is per-body, bodies in DFS preorder)
    for child in elem:
      tag = child.tag
      if tag in ("joint", "freejoint"):
        self._parse_joint(child, bodyid, childclass)
      elif tag == "geom":
        self._parse_geom(child, bodyid, childclass)
      elif tag == "site":
        self._parse_site(child, bodyid, childclass)
      elif tag == "camera":
        self.cameras.append(child.get("name", f"#{len(self.cameras)}"))
      # lights etc: render-only, skipped
    for child in elem:
      if child.tag == "body":
        self._parse_body(child, bodyid, childclass)
      elif child.tag == "replicate":
        self._parse_replicate(child, bodyid, childclass)

  def _parse_body(self, elem: ET.Element, parent: int, childclass: str):
    b = _Body()
    b.name = elem.get("name", f"#{len(self.bodies)}")
    b.parent = parent
    b.pos = _getf(elem.attrib, "pos", np.zeros(3))
    b.quat = _orientation(elem.attrib, self.angle_scale, self.eulerseq)
    bodyid = len(self.bodies)
    self.bodies.append(b)
    inertial = elem.find("inertial")
    if inertial is not None:
      mass = float(inertial.get("mass"))
      ipos = _getf(inertial.attrib, "pos", np.zeros(3))
      iquat = _orientation(inertial.attrib, self.angle_scale, self.eulerseq)
      if inertial.get("diaginertia"):
        diag = _floats(inertial.get("diaginertia"))
      else:
        fi = _floats(inertial.get("fullinertia"))
        F = np.array([[fi[0], fi[3], fi[4]],
                      [fi[3], fi[1], fi[5]],
                      [fi[4], fi[5], fi[2]]])
        w, V = np.linalg.eigh(F)
        order = np.argsort(-w)
        diag = w[order]
        R = V[:, order]
        if np.linalg.det(R) < 0:
          R[:, 2] *= -1
        iquat = _quat_mul(iquat, _mat_to_quat(R))
      b.explicit_inertial = (mass, np.asarray(ipos, np.float64).reshape(3),
                             iquat, diag)
    cc = elem.get("childclass", childclass)
    self._parse_body_children(elem, bodyid, cc)

  def _parse_joint(self, elem: ET.Element, bodyid: int, childclass: str):
    j = _Joint()
    if elem.tag == "freejoint":
      attrs = dict(elem.attrib)
      jtype = JointType.FREE
    else:
      attrs = self.defaults.resolve("joint", elem, childclass)
      jtype = {"free": JointType.FREE, "ball": JointType.BALL,
               "slide": JointType.SLIDE,
               "hinge": JointType.HINGE}[attrs.get("type", "hinge")]
    ang = self.angle_scale if jtype == JointType.HINGE else 1.0
    j.name = attrs.get("name", f"#{len(self.joints)}")
    j.type = jtype
    j.bodyid = bodyid
    j.pos = np.asarray(_getf(attrs, "pos", np.zeros(3)), np.float64)
    axis = np.asarray(_getf(attrs, "axis", np.array([0.0, 0, 1])),
                      np.float64)
    j.axis = axis / max(np.linalg.norm(axis), 1e-14)
    rng = _getf(attrs, "range", np.zeros(2))
    j.range = np.asarray(rng, np.float64).reshape(2) * ang
    limited = attrs.get("limited", "auto")
    if limited == "auto":
      j.limited = self.autolimits and "range" in attrs and np.any(j.range)
    else:
      j.limited = limited == "true"
    j.stiffness = float(_getf(attrs, "stiffness", 0.0))
    j.damping = float(_getf(attrs, "damping", 0.0))
    j.armature = float(_getf(attrs, "armature", 0.0))
    j.frictionloss = float(_getf(attrs, "frictionloss", 0.0))
    j.ref = float(_getf(attrs, "ref", 0.0)) * ang
    j.springref = float(_getf(attrs, "springref", 0.0)) * ang
    j.margin = float(_getf(attrs, "margin", 0.0)) * ang
    j.solref = _vec(attrs, "solreflimit", [0.02, 1.0])
    j.solimp = _vec(attrs, "solimplimit", [0.9, 0.95, 0.001, 0.5, 2.0])
    self.joints.append(j)
    self.bodies[bodyid].joints.append(len(self.joints) - 1)

  def _parse_geom(self, elem: ET.Element, bodyid: int, childclass: str):
    attrs = self.defaults.resolve("geom", elem, childclass)
    g = _Geom()
    g.name = attrs.get("name", f"#{len(self.geoms)}")
    g.bodyid = bodyid
    g.type = int(_GEOM_TYPES[attrs.get("type", "sphere")])
    size = np.zeros(3)
    sz = _getf(attrs, "size", np.zeros(0))
    sz = np.atleast_1d(np.asarray(sz, np.float64))
    size[:len(sz)] = sz[:3]
    if "fromto" in attrs:
      ft = _floats(attrs["fromto"])
      p1, p2 = ft[:3], ft[3:]
      g.pos = 0.5 * (p1 + p2)
      # MuJoCo orients the frame z toward the FIRST endpoint
      g.quat = _zaxis_quat(p1 - p2)
      size[1] = 0.5 * np.linalg.norm(p2 - p1)
    else:
      g.pos = np.asarray(_getf(attrs, "pos", np.zeros(3)),
                         np.float64).reshape(3)
      g.quat = _orientation(attrs, self.angle_scale, self.eulerseq)
    g.size = size
    g.contype = int(_getf(attrs, "contype", 1))
    g.conaffinity = int(_getf(attrs, "conaffinity", 1))
    g.condim = int(_getf(attrs, "condim", 3))
    g.priority = int(_getf(attrs, "priority", 0))
    g.solmix = float(_getf(attrs, "solmix", 1.0))
    g.solref = _vec(attrs, "solref", [0.02, 1.0])
    g.solimp = _vec(attrs, "solimp", [0.9, 0.95, 0.001, 0.5, 2.0])
    g.friction = _vec(attrs, "friction", [1.0, 0.005, 0.0001])
    g.margin = float(_getf(attrs, "margin", 0.0))
    g.gap = float(_getf(attrs, "gap", 0.0))
    g.density = float(_getf(attrs, "density", 1000.0))
    g.mass = float(attrs["mass"]) if "mass" in attrs else None
    self.geoms.append(g)
    self.bodies[bodyid].geoms.append(len(self.geoms) - 1)

  def _parse_site(self, elem: ET.Element, bodyid: int, childclass: str):
    attrs = self.defaults.resolve("site", elem, childclass)
    s = _Site()
    s.name = attrs.get("name", f"#{len(self.sites)}")
    s.bodyid = bodyid
    s.type = int(_GEOM_TYPES[attrs.get("type", "sphere")])
    s.size = _vec(attrs, "size", [0.005, 0.005, 0.005])
    if "fromto" in attrs:
      ft = _floats(attrs["fromto"])
      p1, p2 = ft[:3], ft[3:]
      s.pos = 0.5 * (p1 + p2)
      s.quat = _zaxis_quat(p1 - p2)
      s.size[1] = 0.5 * np.linalg.norm(p2 - p1)
    else:
      s.pos = np.asarray(_getf(attrs, "pos", np.zeros(3)),
                         np.float64).reshape(3)
      s.quat = _orientation(attrs, self.angle_scale, self.eulerseq)
    self.sites.append(s)

  # ------------------------------------------------------------- replicate
  def _parse_replicate(self, elem: ET.Element, parent: int,
                       childclass: str):
    count = int(elem.get("count"))
    sep = elem.get("sep", "")
    offset = np.asarray(_getf(elem.attrib, "offset", np.zeros(3)),
                        np.float64).reshape(3)
    euler = np.asarray(_getf(elem.attrib, "euler", np.zeros(3)),
                       np.float64).reshape(3) * self.angle_scale
    qstep = np.array([1.0, 0, 0, 0])
    for ax, a in zip(self.eulerseq, euler):
      r = _axis_angle_quat(_AXES[ax.lower()], a)
      qstep = _quat_mul(qstep, r) if ax.islower() else _quat_mul(r, qstep)

    self._replicated_names = getattr(self, "_replicated_names", {})
    pos = np.zeros(3)
    q = np.array([1.0, 0, 0, 0])
    for i in range(count):
      for child in elem:
        c = copy.deepcopy(child)
        self._suffix_names(c, f"{sep}{i}")
        if c.tag == "body":
          # transform the copy's frame by the accumulated replicate frame
          cp = np.asarray(_getf(c.attrib, "pos", np.zeros(3)),
                          np.float64).reshape(3)
          cq = _orientation(c.attrib, self.angle_scale, self.eulerseq)
          newp = pos + _quat_to_mat(q) @ cp
          newq = _quat_mul(q, cq)
          c.attrib["pos"] = " ".join(str(x) for x in newp)
          for k in ("quat", "euler", "axisangle", "zaxis", "xyaxes"):
            c.attrib.pop(k, None)
          c.attrib["quat"] = " ".join(str(x) for x in newq)
          self._parse_body(c, parent, childclass)
        else:
          self._parse_body_children_single(c, parent, childclass)
      pos = pos + _quat_to_mat(q) @ offset
      q = _quat_mul(q, qstep)

  def _parse_body_children_single(self, child, bodyid, childclass):
    wrapper = ET.Element("wrapper")
    wrapper.append(child)
    self._parse_body_children(wrapper, bodyid, childclass)

  def _suffix_names(self, elem: ET.Element, suffix: str):
    names = self._replicated_names
    for e in elem.iter():
      if "name" in e.attrib:
        old = e.attrib["name"]
        lst = names.setdefault(old, [])
        # a joint and a site may share a name (e.g. rodent toe_L): one
        # entry per replicate copy, not per element
        if old + suffix not in lst:
          lst.append(old + suffix)
        e.attrib["name"] = old + suffix

  def _expand_replicated_refs(self):
    """Duplicate referencing elements whose targets were replicated."""
    names: Dict[str, List[str]] = getattr(self, "_replicated_names", {})
    if not names:
      return

    def expand(items, get_refs, rebuild):
      """Copy-major MuJoCo ordering: non-replicated items first (original
      order), then for each copy i ALL replicated items in original order,
      names suffixed like their targets ('-0', '-1', ...)."""
      rep = [it for it in items
             if any(r in names for r in get_refs(it))]
      if not rep:
        return items
      out = [it for it in items
             if not any(r in names for r in get_refs(it))]
      anchor = next(r for r in get_refs(rep[0]) if r in names)
      ncopy = len(names[anchor])
      for i in range(ncopy):
        for it in rep:
          a = next(r for r in get_refs(it) if r in names)
          suffix = names[a][i][len(a):]
          out.append(rebuild(
              it, lambda r: names[r][i] if r in names else r, suffix))
      return out

    def sub_attrs(attrs, keys, f, suffix):
      a = dict(attrs)
      for k in keys:
        if k in a and a[k] in names:
          a[k] = f(a[k])
      if "name" in a:
        a["name"] = a["name"] + suffix
      return a

    self.actuators = expand(
        self.actuators,
        lambda it: [it[1].get("joint", ""), it[1].get("tendon", ""),
                    it[1].get("site", "")],
        lambda it, f, sfx: (it[0], sub_attrs(it[1],
                                             ("joint", "tendon", "site"),
                                             f, sfx)))
    self.sensors = expand(
        self.sensors, lambda it: [it[1]],
        lambda it, f, sfx: (it[0], f(it[1]), it[2] + sfx))
    self.tendons = expand(
        self.tendons, lambda it: [w[0] for w in it[1]],
        lambda it, f, sfx: (dict(it[0],
                                 name=it[0].get("name", "") + sfx),
                            [(f(jn), c) for jn, c in it[1]]))
    self.pairs = expand(
        self.pairs, lambda it: [it.get("geom1", ""), it.get("geom2", "")],
        lambda it, f, sfx: sub_attrs(it, ("geom1", "geom2"), f, sfx))
    self.excludes = expand(
        self.excludes, lambda it: list(it),
        lambda it, f, sfx: (f(it[0]), f(it[1])))

  # --------------------------------------------------------------- assemble
  def _assemble(self, opt: Option) -> Model:
    nbody = len(self.bodies)
    njnt = len(self.joints)
    ngeom = len(self.geoms)
    nsite = len(self.sites)

    body_parentid = np.array([b.parent for b in self.bodies], np.int32)
    body_names = tuple(b.name for b in self.bodies)
    name2body = {n: i for i, n in enumerate(body_names)}
    joint_names = tuple(j.name for j in self.joints)
    name2joint = {n: i for i, n in enumerate(joint_names)}
    geom_names = tuple(g.name for g in self.geoms)
    name2geom = {n: i for i, n in enumerate(geom_names)}
    site_names = tuple(s.name for s in self.sites)
    name2site = {n: i for i, n in enumerate(site_names)}

    # joint addressing
    _QNUM = {JointType.FREE: 7, JointType.BALL: 4, JointType.SLIDE: 1,
             JointType.HINGE: 1}
    _VNUM = {JointType.FREE: 6, JointType.BALL: 3, JointType.SLIDE: 1,
             JointType.HINGE: 1}
    jnt_qposadr = np.zeros(njnt, np.int32)
    jnt_dofadr = np.zeros(njnt, np.int32)
    nq = nv = 0
    for ji, j in enumerate(self.joints):
      jnt_qposadr[ji], jnt_dofadr[ji] = nq, nv
      nq += _QNUM[j.type]
      nv += _VNUM[j.type]

    # body joint/dof/geom addressing (bodies appear in DFS document order;
    # their joints were appended in the same order)
    body_jntadr = np.full(nbody, -1, np.int32)
    body_jntnum = np.zeros(nbody, np.int32)
    body_dofadr = np.full(nbody, -1, np.int32)
    body_dofnum = np.zeros(nbody, np.int32)
    body_geomadr = np.full(nbody, -1, np.int32)
    body_geomnum = np.zeros(nbody, np.int32)
    for bi, b in enumerate(self.bodies):
      if b.joints:
        body_jntadr[bi] = b.joints[0]
        body_jntnum[bi] = len(b.joints)
        body_dofadr[bi] = jnt_dofadr[b.joints[0]]
        body_dofnum[bi] = sum(_VNUM[self.joints[j].type]
                              for j in b.joints)
      if b.geoms:
        body_geomadr[bi] = b.geoms[0]
        body_geomnum[bi] = len(b.geoms)

    # rootid / weldid
    body_rootid = np.zeros(nbody, np.int32)
    body_weldid = np.zeros(nbody, np.int32)
    for bi in range(1, nbody):
      p = body_parentid[bi]
      # weld: no joints -> welded to parent's weld
      body_weldid[bi] = bi if body_jntnum[bi] else body_weldid[p]
      # root: first body under world whose kinematic chain starts there
      if p == 0:
        body_rootid[bi] = bi
      else:
        body_rootid[bi] = body_rootid[p]

    # dof arrays
    dof_bodyid = np.zeros(nv, np.int32)
    dof_jntid = np.zeros(nv, np.int32)
    dof_parentid = np.full(nv, -1, np.int32)
    dof_armature = np.zeros(nv)
    dof_damping = np.zeros(nv)
    dof_frictionloss = np.zeros(nv)
    # last dof of each body (for dof tree links)
    body_lastdof = np.full(nbody, -1, np.int32)
    for bi in range(1, nbody):
      p = body_parentid[bi]
      last = body_lastdof[p]
      for ji in self.bodies[bi].joints:
        j = self.joints[ji]
        for k in range(_VNUM[j.type]):
          v = jnt_dofadr[ji] + k
          dof_bodyid[v] = bi
          dof_jntid[v] = ji
          dof_parentid[v] = last
          dof_armature[v] = j.armature
          dof_damping[v] = j.damping
          dof_frictionloss[v] = j.frictionloss
          last = v
      body_lastdof[bi] = last if self.bodies[bi].joints else \
          body_lastdof[p]

    # qpos0 / qpos_spring
    qpos0 = np.zeros(nq)
    qpos_spring = np.zeros(nq)
    for ji, j in enumerate(self.joints):
      adr = jnt_qposadr[ji]
      if j.type == JointType.FREE:
        b = self.bodies[j.bodyid]
        qpos0[adr:adr + 3] = b.pos
        qpos0[adr + 3:adr + 7] = b.quat
        qpos_spring[adr:adr + 7] = qpos0[adr:adr + 7]
      elif j.type == JointType.BALL:
        qpos0[adr:adr + 4] = [1, 0, 0, 0]
        qpos_spring[adr:adr + 4] = [1, 0, 0, 0]
      else:
        qpos0[adr] = j.ref
        qpos_spring[adr] = j.springref

    # free-joint bodies: MuJoCo re-expresses the body at the origin? No:
    # body_pos stays; qpos0 holds the world pose. (kinematics composes
    # qpos for free joints directly.)

    # ---- body inertial properties
    body_mass = np.zeros(nbody)
    body_ipos = np.zeros((nbody, 3))
    body_iquat = np.tile([1.0, 0, 0, 0], (nbody, 1))
    body_inertia = np.zeros((nbody, 3))
    for bi, b in enumerate(self.bodies):
      if bi == 0:
        continue
      if b.explicit_inertial is not None:
        mass, ipos, iquat, diag = b.explicit_inertial
        body_mass[bi] = mass
        body_ipos[bi] = ipos
        body_iquat[bi] = iquat
        body_inertia[bi] = diag
        continue
      # single geom: inertial frame IS the geom frame (MuJoCo keeps the
      # geom orientation; no eigen-reordering)
      if len(b.geoms) == 1:
        g = self.geoms[b.geoms[0]]
        m, diag = geom_mass_inertia(g.type, g.size, g.density, g.mass)
        if m > 0:
          body_mass[bi] = max(m, self.boundmass)
          body_ipos[bi] = g.pos
          body_iquat[bi] = g.quat
          body_inertia[bi] = np.maximum(diag, self.boundinertia)
          continue
      # accumulate geoms
      total_m = 0.0
      com = np.zeros(3)
      for gi in b.geoms:
        g = self.geoms[gi]
        m, _ = geom_mass_inertia(g.type, g.size, g.density, g.mass)
        total_m += m
        com += m * g.pos
      if total_m <= 0:
        body_mass[bi] = max(self.boundmass, 0.0)
        body_inertia[bi] = np.full(3, max(self.boundinertia, 0.0))
        continue
      com /= total_m
      I = np.zeros((3, 3))
      for gi in b.geoms:
        g = self.geoms[gi]
        m, diag = geom_mass_inertia(g.type, g.size, g.density, g.mass)
        R = _quat_to_mat(g.quat)
        Ig = R @ np.diag(diag) @ R.T
        d = g.pos - com
        Ig += m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
        I += Ig
      w, V = np.linalg.eigh(I)
      order = np.argsort(-w)       # decreasing eigenvalues
      w = w[order]
      V = V[:, order]
      if np.linalg.det(V) < 0:
        V[:, 2] *= -1
      body_mass[bi] = max(total_m, self.boundmass)
      body_ipos[bi] = com
      body_iquat[bi] = _mat_to_quat(V)
      body_inertia[bi] = np.maximum(w, self.boundinertia)

    body_subtreemass = body_mass.copy()
    for bi in range(nbody - 1, 0, -1):
      body_subtreemass[body_parentid[bi]] += body_subtreemass[bi]

    # ---- tendons
    ntendon = len(self.tendons)
    nwrap = sum(len(w) for _, w in self.tendons)
    tendon_adr = np.zeros(ntendon, np.int32)
    tendon_num = np.zeros(ntendon, np.int32)
    tendon_limited = np.zeros(ntendon, bool)
    tendon_range = np.zeros((ntendon, 2))
    tendon_solref_lim = np.tile([0.02, 1.0], (ntendon, 1))
    tendon_solimp_lim = np.tile([0.9, 0.95, 0.001, 0.5, 2.0],
                                (ntendon, 1))
    tendon_stiffness = np.zeros(ntendon)
    tendon_damping = np.zeros(ntendon)
    tendon_lengthspring = np.zeros((ntendon, 2))
    wrap_jntid = np.zeros(nwrap, np.int32)
    wrap_coef = np.zeros(nwrap)
    tendon_names = []
    wadr = 0
    for ti, (attrs, wraps) in enumerate(self.tendons):
      tendon_names.append(attrs.get("name", f"#{ti}"))
      tendon_adr[ti] = wadr
      tendon_num[ti] = len(wraps)
      rng = _getf(attrs, "range", np.zeros(2))
      tendon_range[ti] = np.asarray(rng, np.float64).reshape(2)
      limited = attrs.get("limited", "auto")
      if limited == "auto":
        tendon_limited[ti] = (self.autolimits and "range" in attrs
                              and np.any(tendon_range[ti]))
      else:
        tendon_limited[ti] = limited == "true"
      tendon_solref_lim[ti] = _vec(attrs, "solreflimit", [0.02, 1.0])
      tendon_solimp_lim[ti] = _vec(attrs, "solimplimit",
                                   [0.9, 0.95, 0.001, 0.5, 2.0])
      tendon_stiffness[ti] = float(_getf(attrs, "stiffness", 0.0))
      tendon_damping[ti] = float(_getf(attrs, "damping", 0.0))
      if "springlength" in attrs:
        sl = np.atleast_1d(np.asarray(_getf(attrs, "springlength", None),
                                      np.float64))
        tendon_lengthspring[ti] = (sl[0], sl[-1])
      else:
        tendon_lengthspring[ti] = (-1.0, -1.0)  # resolved at setconst
      for jn, coef in wraps:
        wrap_jntid[wadr] = name2joint[jn]
        wrap_coef[wadr] = coef
        wadr += 1

    # ---- actuators
    nu = len(self.actuators)
    act_trntype = np.zeros(nu, np.int32)
    act_dyntype = np.zeros(nu, np.int32)
    act_gaintype = np.zeros(nu, np.int32)
    act_biastype = np.zeros(nu, np.int32)
    act_trnid = np.full((nu, 2), -1, np.int32)
    act_actadr = np.full(nu, -1, np.int32)
    act_actnum = np.zeros(nu, np.int32)
    act_ctrllimited = np.zeros(nu, bool)
    act_forcelimited = np.zeros(nu, bool)
    act_dynprm = np.zeros((nu, 10))
    act_dynprm[:, 0] = 1.0           # MuJoCo default dynprm = [1, 0, ...]
    act_gainprm = np.zeros((nu, 10))
    act_biasprm = np.zeros((nu, 10))
    act_ctrlrange = np.zeros((nu, 2))
    act_forcerange = np.zeros((nu, 2))
    act_gear = np.zeros((nu, 6))
    actuator_names = []
    na = 0
    _DYN = {"none": DynType.NONE, "integrator": DynType.INTEGRATOR,
            "filter": DynType.FILTER, "filterexact": DynType.FILTEREXACT}
    _GAIN = {"fixed": GainType.FIXED, "affine": GainType.AFFINE,
             "muscle": GainType.MUSCLE}
    _BIAS = {"none": BiasType.NONE, "affine": BiasType.AFFINE,
             "muscle": BiasType.MUSCLE}
    for ai, (tag, attrs) in enumerate(self.actuators):
      actuator_names.append(attrs.get("name", f"#{ai}"))
      if "joint" in attrs:
        act_trntype[ai] = int(TrnType.JOINT)
        act_trnid[ai, 0] = name2joint[attrs["joint"]]
      elif "tendon" in attrs:
        act_trntype[ai] = int(TrnType.TENDON)
        act_trnid[ai, 0] = tendon_names.index(attrs["tendon"])
      elif "site" in attrs:
        act_trntype[ai] = int(TrnType.SITE)
        act_trnid[ai, 0] = name2site[attrs["site"]]
      gear = np.atleast_1d(np.asarray(_getf(attrs, "gear",
                                            np.array([1.0])), np.float64))
      act_gear[ai, :len(gear)] = gear[:6]
      if tag == "general":
        act_dyntype[ai] = int(_DYN[attrs.get("dyntype", "none")])
        act_gaintype[ai] = int(_GAIN[attrs.get("gaintype", "fixed")])
        act_biastype[ai] = int(_BIAS[attrs.get("biastype", "none")])
        dynprm = np.atleast_1d(np.asarray(
            _getf(attrs, "dynprm", np.array([1.0])), np.float64))
        gainprm = np.atleast_1d(np.asarray(
            _getf(attrs, "gainprm", np.array([1.0])), np.float64))
        biasprm = np.atleast_1d(np.asarray(
            _getf(attrs, "biasprm", np.zeros(1)), np.float64))
        act_dynprm[ai, :len(dynprm)] = dynprm[:10]
        act_gainprm[ai, :len(gainprm)] = gainprm[:10]
        act_biasprm[ai, :len(biasprm)] = biasprm[:10]
      elif tag == "motor":
        act_gainprm[ai, 0] = 1.0
      elif tag == "position":
        kp = float(_getf(attrs, "kp", 1.0))
        kv = float(_getf(attrs, "kv", 0.0))
        act_gainprm[ai, 0] = kp
        act_biastype[ai] = int(BiasType.AFFINE)
        act_biasprm[ai, 1] = -kp
        act_biasprm[ai, 2] = -kv
      elif tag == "velocity":
        kv = float(_getf(attrs, "kv", 1.0))
        act_gainprm[ai, 0] = kv
        act_biastype[ai] = int(BiasType.AFFINE)
        act_biasprm[ai, 2] = -kv
      if act_dyntype[ai] != int(DynType.NONE):
        act_actadr[ai] = na
        act_actnum[ai] = 1
        na += 1
      crange = _getf(attrs, "ctrlrange", None)
      if crange is not None:
        act_ctrlrange[ai] = np.asarray(crange, np.float64).reshape(2)
      climited = attrs.get("ctrllimited", "auto")
      if climited == "auto":
        act_ctrllimited[ai] = (self.autolimits and crange is not None
                               and np.any(act_ctrlrange[ai]))
      else:
        act_ctrllimited[ai] = climited == "true"
      frange = _getf(attrs, "forcerange", None)
      if frange is not None:
        act_forcerange[ai] = np.asarray(frange, np.float64).reshape(2)
      flimited = attrs.get("forcelimited", "auto")
      if flimited == "auto":
        act_forcelimited[ai] = (self.autolimits and frange is not None
                                and np.any(act_forcerange[ai]))
      else:
        act_forcelimited[ai] = flimited == "true"

    # ---- sensors
    nsensor = len(self.sensors)
    sensor_type = np.zeros(nsensor, np.int32)
    sensor_objid = np.zeros(nsensor, np.int32)
    sensor_adr = np.zeros(nsensor, np.int32)
    sensor_dim = np.zeros(nsensor, np.int32)
    sensor_names = []
    _DIM = {int(SensorType.TOUCH): 1, int(SensorType.ACCELEROMETER): 3,
            int(SensorType.VELOCIMETER): 3, int(SensorType.GYRO): 3,
            int(SensorType.SUBTREELINVEL): 3,
            int(SensorType.SUBTREECOM): 3}
    adr = 0
    for si, (stype, target, name) in enumerate(self.sensors):
      sensor_names.append(name or f"#{si}")
      sensor_type[si] = stype
      if stype == int(SensorType.SUBTREELINVEL) or \
         stype == int(SensorType.SUBTREECOM):
        sensor_objid[si] = name2body[target]
      else:
        sensor_objid[si] = name2site[target]
      sensor_adr[si] = adr
      sensor_dim[si] = _DIM[stype]
      adr += _DIM[stype]

    # ---- keyframes
    nkey = len(self.keyframes)
    key_qpos = np.zeros((nkey, nq))
    key_names = []
    for ki, (name, qstr) in enumerate(self.keyframes):
      key_names.append(name)
      if qstr:
        vals = _floats(qstr)
        key_qpos[ki, :len(vals)] = vals

    model = Model(
        nq=nq, nv=nv, nu=nu, na=na, nbody=nbody, njnt=njnt, ngeom=ngeom,
        nsite=nsite, ntendon=ntendon, nwrap=nwrap, nsensor=nsensor,
        nsensordata=int(adr), nkey=nkey, opt=opt,
        qpos0=qpos0, qpos_spring=qpos_spring,
        body_parentid=body_parentid, body_rootid=body_rootid,
        body_weldid=body_weldid,
        body_jntadr=body_jntadr, body_jntnum=body_jntnum,
        body_dofadr=body_dofadr, body_dofnum=body_dofnum,
        body_geomadr=body_geomadr, body_geomnum=body_geomnum,
        body_pos=np.stack([b.pos for b in self.bodies]),
        body_quat=np.stack([b.quat for b in self.bodies]),
        body_ipos=body_ipos, body_iquat=body_iquat,
        body_mass=body_mass, body_subtreemass=body_subtreemass,
        body_inertia=body_inertia,
        body_invweight0=np.zeros((nbody, 2)),       # setconst
        jnt_type=np.array([int(j.type) for j in self.joints], np.int32),
        jnt_qposadr=jnt_qposadr, jnt_dofadr=jnt_dofadr,
        jnt_bodyid=np.array([j.bodyid for j in self.joints], np.int32)
        if njnt else np.zeros(0, np.int32),
        jnt_limited=np.array([j.limited for j in self.joints], bool)
        if njnt else np.zeros(0, bool),
        jnt_solref=np.stack([j.solref for j in self.joints])
        if njnt else np.zeros((0, 2)),
        jnt_solimp=np.stack([j.solimp for j in self.joints])
        if njnt else np.zeros((0, 5)),
        jnt_pos=np.stack([j.pos for j in self.joints])
        if njnt else np.zeros((0, 3)),
        jnt_axis=np.stack([j.axis for j in self.joints])
        if njnt else np.zeros((0, 3)),
        jnt_stiffness=np.array([j.stiffness for j in self.joints]),
        jnt_range=np.stack([j.range for j in self.joints])
        if njnt else np.zeros((0, 2)),
        jnt_margin=np.array([j.margin for j in self.joints]),
        dof_bodyid=dof_bodyid, dof_jntid=dof_jntid,
        dof_parentid=dof_parentid, dof_armature=dof_armature,
        dof_damping=dof_damping,
        dof_invweight0=np.zeros(nv),                # setconst
        dof_frictionloss=dof_frictionloss,
        geom_type=np.array([g.type for g in self.geoms], np.int32),
        geom_bodyid=np.array([g.bodyid for g in self.geoms], np.int32),
        geom_contype=np.array([g.contype for g in self.geoms], np.int32),
        geom_conaffinity=np.array([g.conaffinity for g in self.geoms],
                                  np.int32),
        geom_condim=np.array([g.condim for g in self.geoms], np.int32),
        geom_priority=np.array([g.priority for g in self.geoms],
                               np.int32),
        geom_solmix=np.array([g.solmix for g in self.geoms]),
        geom_solref=np.stack([g.solref for g in self.geoms])
        if ngeom else np.zeros((0, 2)),
        geom_solimp=np.stack([g.solimp for g in self.geoms])
        if ngeom else np.zeros((0, 5)),
        geom_size=np.stack([g.size for g in self.geoms])
        if ngeom else np.zeros((0, 3)),
        geom_pos=np.stack([g.pos for g in self.geoms])
        if ngeom else np.zeros((0, 3)),
        geom_quat=np.stack([g.quat for g in self.geoms])
        if ngeom else np.zeros((0, 4)),
        geom_friction=np.stack([g.friction for g in self.geoms])
        if ngeom else np.zeros((0, 3)),
        geom_margin=np.array([g.margin for g in self.geoms]),
        geom_gap=np.array([g.gap for g in self.geoms]),
        site_bodyid=np.array([s.bodyid for s in self.sites], np.int32),
        site_pos=np.stack([s.pos for s in self.sites])
        if nsite else np.zeros((0, 3)),
        site_quat=np.stack([s.quat for s in self.sites])
        if nsite else np.zeros((0, 4)),
        site_size=np.stack([s.size for s in self.sites])
        if nsite else np.zeros((0, 3)),
        site_type=np.array([s.type for s in self.sites], np.int32),
        tendon_adr=tendon_adr, tendon_num=tendon_num,
        tendon_limited=tendon_limited, tendon_range=tendon_range,
        tendon_solref_lim=tendon_solref_lim,
        tendon_solimp_lim=tendon_solimp_lim,
        tendon_stiffness=tendon_stiffness, tendon_damping=tendon_damping,
        tendon_lengthspring=tendon_lengthspring,
        tendon_length0=np.zeros(ntendon),           # setconst
        tendon_invweight0=np.zeros(ntendon),        # setconst
        wrap_jntid=wrap_jntid, wrap_coef=wrap_coef,
        actuator_trntype=act_trntype, actuator_dyntype=act_dyntype,
        actuator_gaintype=act_gaintype, actuator_biastype=act_biastype,
        actuator_trnid=act_trnid, actuator_actadr=act_actadr,
        actuator_actnum=act_actnum,
        actuator_ctrllimited=act_ctrllimited,
        actuator_forcelimited=act_forcelimited,
        actuator_dynprm=act_dynprm, actuator_gainprm=act_gainprm,
        actuator_biasprm=act_biasprm, actuator_ctrlrange=act_ctrlrange,
        actuator_forcerange=act_forcerange, actuator_gear=act_gear,
        actuator_acc0=np.zeros(nu),                 # setconst
        sensor_type=sensor_type, sensor_objid=sensor_objid,
        sensor_adr=sensor_adr, sensor_dim=sensor_dim,
        key_qpos=key_qpos,
        contact_slots=(),
        body_names=body_names, joint_names=joint_names,
        geom_names=geom_names, site_names=site_names,
        actuator_names=tuple(actuator_names),
        sensor_names=tuple(sensor_names),
        camera_names=tuple(self.cameras),
        key_names=tuple(key_names),
    )

    model = model.replace(contact_slots=self._contact_slots(model))
    model = set_constants(model)
    return model

  def _contact_slots(self, model: Model):
    """Static pair table via the shared broadphase-admission logic."""
    from brax_rodent_run_tpu.mjcf import from_mj

    name2geom = {n: i for i, n in enumerate(model.geom_names)}
    name2body = {n: i for i, n in enumerate(model.body_names)}

    class _Shim:
      pass

    shim = _Shim()
    for attr in ("ngeom", "geom_type", "geom_bodyid", "geom_contype",
                 "geom_conaffinity", "geom_condim", "geom_priority",
                 "geom_solmix", "geom_solref", "geom_solimp",
                 "geom_friction", "geom_margin", "geom_gap",
                 "body_weldid", "body_parentid", "opt"):
      setattr(shim, attr, getattr(model, attr))
    # canonicalize (geom1 < geom2) and sort by signature (MuJoCo compiler
    # orders explicit pairs by geom ids, not document order)
    def _key(p):
      a, b = name2geom[p["geom1"]], name2geom[p["geom2"]]
      return (min(a, b), max(a, b))

    self.pairs.sort(key=_key)
    shim.npair = len(self.pairs)
    shim.pair_geom1 = np.array(
        [min(name2geom[p["geom1"]], name2geom[p["geom2"]])
         for p in self.pairs], np.int32)
    shim.pair_geom2 = np.array(
        [max(name2geom[p["geom1"]], name2geom[p["geom2"]])
         for p in self.pairs], np.int32)
    shim.pair_dim = np.array(
        [int(_getf(p, "condim", 3)) for p in self.pairs], np.int32)
    shim.pair_friction = np.stack(
        [_vec(p, "friction", [1.0, 1.0, 0.005, 0.0001, 0.0001])
         for p in self.pairs]) if self.pairs else np.zeros((0, 5))
    shim.pair_solref = np.stack(
        [_vec(p, "solref", [0.02, 1.0]) for p in self.pairs]) \
        if self.pairs else np.zeros((0, 2))
    shim.pair_solimp = np.stack(
        [_vec(p, "solimp", [0.9, 0.95, 0.001, 0.5, 2.0])
         for p in self.pairs]) if self.pairs else np.zeros((0, 5))
    shim.pair_margin = np.array(
        [float(_getf(p, "margin", 0.0)) for p in self.pairs])
    shim.pair_gap = np.array(
        [float(_getf(p, "gap", 0.0)) for p in self.pairs])
    shim.nexclude = len(self.excludes)
    shim.exclude_signature = np.array(
        [(name2body[b1] << 16) | name2body[b2]
         for b1, b2 in self.excludes], np.int32)
    return from_mj.build_contact_slots(shim)


# ---------------------------------------------------------------------------
# derived constants (mj_setConst semantics) via our own pipeline at qpos0
# ---------------------------------------------------------------------------


_RESTORE_UNSET = object()


def set_constants(model: Model) -> Model:
  import contextlib
  import jax

  # jax.devices("cpu") initializes ALL backends; when the accelerator
  # backend is broken (e.g. a dead axon tunnel) it raises RuntimeError —
  # or HANGS inside plugin init — and takes down this CPU-only
  # computation with it. Model loading must work with the chip
  # unreachable: if no backend is initialized yet, restrict jax to CPU
  # for the duration of this function, then restore the platform config
  # and drop the backend cache so a later accelerator query in the same
  # process initializes normally. (Safe because every output of this
  # function is converted to numpy, and an empty backend cache means no
  # live jax arrays exist anywhere in the process.)
  from jax._src import xla_bridge as _xb

  restore_platforms = _RESTORE_UNSET
  if _xb._backends:
    # backends already up: a cpu query is a cache hit, no init risk
    try:
      cpu_ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
      cpu_ctx = contextlib.nullcontext()
  else:
    prev = jax.config.jax_platforms
    if prev != "cpu":
      jax.config.update("jax_platforms", "cpu")
      restore_platforms = prev
    cpu_ctx = jax.default_device(jax.devices("cpu")[0])

  try:
    return _set_constants_impl(model, cpu_ctx)
  finally:
    if restore_platforms is not _RESTORE_UNSET:
      jax.config.update("jax_platforms", restore_platforms)
      _xb._clear_backends()


def _set_constants_impl(model: Model, cpu_ctx) -> Model:
  import jax
  import jax.numpy as jnp
  from brax_rodent_run_tpu.physics import smooth
  from brax_rodent_run_tpu.physics.types import make_data

  with cpu_ctx:
    d = make_data(model, dtype=jnp.float64)
    d = smooth.kinematics(model, d)
    d = smooth.com_pos(model, d)
    d = smooth.tendon(model, d)
    d = smooth.crb(model, d, factor=False)
    d = smooth.transmission(model, d)

    qM = np.asarray(d.qM)
    nv = model.nv
    Minv = np.linalg.inv(qM) if nv else np.zeros((0, 0))
    subtree_com = np.asarray(d.subtree_com)
    cdof = np.asarray(d.cdof)

    dof_invweight0 = np.diag(Minv).copy() if nv else np.zeros(0)
    # free/ball joints: MuJoCo averages invweight0 within each dof block
    for ji in range(model.njnt):
      adr = model.jnt_dofadr[ji]
      jt = int(model.jnt_type[ji])
      if jt == 0:      # FREE: 3 translational + 3 rotational
        dof_invweight0[adr:adr + 3] = dof_invweight0[adr:adr + 3].mean()
        dof_invweight0[adr + 3:adr + 6] = \
            dof_invweight0[adr + 3:adr + 6].mean()
      elif jt == 1:    # BALL
        dof_invweight0[adr:adr + 3] = dof_invweight0[adr:adr + 3].mean()

    # body ancestor-dof mask = dofs of the body and of all its ancestors
    anc = np.zeros((model.nbody, nv), bool)
    for bi in range(1, model.nbody):
      anc[bi] = anc[model.body_parentid[bi]]
      s, n = model.body_dofadr[bi], model.body_dofnum[bi]
      if n > 0:
        anc[bi, s:s + n] = True

    body_invweight0 = np.zeros((model.nbody, 2))
    xipos = np.asarray(d.xipos)
    for bi in range(1, model.nbody):
      root = model.body_rootid[bi]
      point = xipos[bi]
      jacp = np.zeros((3, nv))
      jacr = np.zeros((3, nv))
      for v in range(nv):
        if not anc[bi, v]:
          continue
        ang = cdof[v, :3]
        lin = cdof[v, 3:]
        jacp[:, v] = lin + np.cross(ang, point - subtree_com[root])
        jacr[:, v] = ang
      Ap = jacp @ Minv @ jacp.T
      Ar = jacr @ Minv @ jacr.T
      body_invweight0[bi, 0] = np.trace(Ap) / 3.0
      body_invweight0[bi, 1] = np.trace(Ar) / 3.0

    ten_J = np.asarray(d.ten_J)
    tendon_length0 = np.asarray(d.ten_length).copy()
    tendon_invweight0 = np.array(
        [ten_J[t] @ Minv @ ten_J[t] for t in range(model.ntendon)])
    lengthspring = model.tendon_lengthspring.copy()
    for t in range(model.ntendon):
      if lengthspring[t, 0] < 0:   # unspecified -> natural length at qpos0
        lengthspring[t] = (tendon_length0[t], tendon_length0[t])

    moment = np.asarray(d.actuator_moment)
    actuator_acc0 = np.array(
        [np.linalg.norm(Minv @ moment[a]) for a in range(model.nu)])

  return model.replace(
      dof_invweight0=dof_invweight0,
      body_invweight0=body_invweight0,
      tendon_length0=tendon_length0,
      tendon_invweight0=tendon_invweight0,
      tendon_lengthspring=lengthspring,
      actuator_acc0=actuator_acc0,
  )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def load_xml_string(xml: str, **opt_overrides) -> Model:
  root = ET.fromstring(xml)
  model = Parser(root).parse()
  return _apply_opt_overrides(model, opt_overrides)


def load_xml(path: str, **opt_overrides) -> Model:
  tree = ET.parse(path)
  root = tree.getroot()
  _resolve_includes(root, os.path.dirname(os.path.abspath(path)))
  model = Parser(root, path).parse()
  return _apply_opt_overrides(model, opt_overrides)


def _resolve_includes(root: ET.Element, base: str):
  for parent in root.iter():
    for i, child in enumerate(list(parent)):
      if child.tag == "include":
        sub = ET.parse(os.path.join(base, child.get("file"))).getroot()
        parent.remove(child)
        for j, grand in enumerate(list(sub)):
          parent.insert(i + j, grand)


def _apply_opt_overrides(model: Model, overrides) -> Model:
  if not overrides:
    return model
  import dataclasses
  opt = model.opt
  kw = {}
  if "solver" in overrides:
    kw["solver"] = {"cg": SolverType.CG, "newton": SolverType.NEWTON,
                    "pgs": SolverType.PGS}[overrides["solver"].lower()]
  for k in ("iterations", "ls_iterations", "timestep", "tolerance"):
    if k in overrides:
      kw[k] = overrides[k]
  return model.replace(opt=dataclasses.replace(opt, **kw))
