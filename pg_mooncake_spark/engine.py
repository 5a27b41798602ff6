"""Engine facade — fleshed out with the lifecycle layer."""

class MooncakeEngine:  # placeholder, implemented in this round
    pass
