"""mjtpu — a TPU-native MJX-class physics engine in JAX/XLA/Pallas.

Public API parity with mujoco_torch (reference mujoco_torch/__init__.py:41-136):
the same function names over (Model, Data) pytrees.  Batch with ``jax.vmap``,
fuse with ``jax.jit``, shard the env axis with ``mjtpu.parallel``.
"""

from mjtpu._src import scan
from mjtpu._src.collision_driver import collision, ncon
from mjtpu._src.constraint import make_constraint
from mjtpu._src.derivative import deriv_smooth_vel
from mjtpu._src.diff_config import (
    DiffConfig,
    differentiable_mode,
    get_diff_config,
)
from mjtpu._src.forward import (
    euler,
    forward,
    fwd_acceleration,
    fwd_actuation,
    fwd_position,
    fwd_velocity,
    implicit,
    rungekutta4,
    step,
)
from mjtpu._src.inverse import inverse
from mjtpu._src.io import (
    device_get_into,
    device_put,
    get_data_into,
    load_checkpoint,
    make_data,
    procedural_terrain,
    put_data,
    put_model,
    save_checkpoint,
)
from mjtpu._src.log import mujoco_logger
from mjtpu._src.math import random_unit_quat
from mjtpu._src.passive import passive
from mjtpu._src.sensor import sensor_acc, sensor_pos, sensor_vel
from mjtpu._src.smooth import (
    camlight,
    com_pos,
    com_vel,
    crb,
    energy_pos,
    energy_vel,
    factor_m,
    kinematics,
    kinetic_energy,
    potential_energy,
    rne,
    rne_postconstraint,
    solve_m,
    subtree_vel,
    tendon,
    tendon_armature,
    transmission,
)
from mjtpu._src.ray import ray, ray_geom
from mjtpu._src.render import (
    precompute_render_data,
    render,
    render_batch,
    render_batch_rgbd,
    render_rgbd,
)
from mjtpu._src.smooth import dense_m as full_m
from mjtpu._src.smooth import mul_m
from mjtpu._src.solver import solve
from mjtpu._src.support import (
    apply_ft,
    constraint_sizes,
    contact_forces,
    geom_distance,
    count_constraints,
    is_sparse,
    jac,
    xfrc_accumulate,
)
from mjtpu._src.types import (
    BiasType,
    CamLightType,
    ConeType,
    ConstraintType,
    Contact,
    ConvexMesh,
    Data,
    DataType,
    DisableBit,
    DynType,
    EnableBit,
    EqType,
    GainType,
    GeomType,
    IntegratorType,
    JacobianType,
    JointType,
    Model,
    ObjType,
    Option,
    SensorType,
    SolverType,
    Statistic,
    TrnType,
    WrapType,
)

__version__ = "0.1.0"
