"""Control stack: gait scheduling, reference trajectories, SRB model, leg control."""
