from pienerf_tpu.sim.solver import (  # noqa: F401
    SimConstants, SimState, Simulator, get_ip_info, sim_init, sim_step,
)
