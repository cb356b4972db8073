"""Training: pjit/DP train loops, optimizer schedules, Orbax checkpoints."""
