"""Training: target assignment, loss, train step, loop, schedule."""
