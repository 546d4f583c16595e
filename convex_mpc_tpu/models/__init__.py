"""Robot models: Go2 parameters, analytic kinematics, rigid-body dynamics."""
