"""convex_mpc_tpu — a TPU-native convex-MPC locomotion engine for the Unitree Go2.

A from-scratch JAX/XLA/Pallas re-design of the MIT Cheetah-3 style centroidal
convex MPC stack (reference capabilities: ltinphan/convex-mpc-unitree-go2):

- ``control.gait``       — gait scheduling, Raibert touchdown, min-jerk swing
                           (reference: convex_mpc/gait.py)
- ``control.reference``  — COM reference trajectory + predicted foot levers
                           (reference: convex_mpc/com_trajectory.py)
- ``control.srb``        — single-rigid-body dynamics, exact closed-form ZOH
                           (reference: convex_mpc/com_trajectory.py:221-286)
- ``mpc``                — QP assembly + batched OSQP-style ADMM solver in JAX
                           (reference: convex_mpc/centroidal_mpc.py + OSQP/CasADi)
- ``control.leg``        — swing/stance leg torque mapping
                           (reference: convex_mpc/leg_controller.py)
- ``models``             — Go2 model, analytic kinematics, rigid-body dynamics
                           (reference capability: Pinocchio + go2_robot_data.py)
- ``sim``                — batched TPU physics plant + closed-loop engine
                           (reference capability: MuJoCo + test_MPC.py)
- ``parallel``           — mesh/sharding scale-out for 10k+ concurrent scenarios
- ``ops``                — rotations, spatial algebra, Pallas kernels
- ``utils``              — config tree, profiling, plotting

Everything on the compute path is pure-functional JAX over pytrees: the
scenario (gait parameters, velocity command, friction, mass) is a batch axis;
``vmap`` within a chip, ``shard_map`` over a ``jax.sharding.Mesh`` across
chips. All reference statefulness (swing closures, takeoff edge detection,
yaw unwrap, QP warm starts) is explicit carried state threaded through
``lax.scan``.
"""

__version__ = "0.1.0"
