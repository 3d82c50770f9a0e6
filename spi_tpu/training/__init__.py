"""Inversion engine: latent projectors (stage 1) and generator-tuning
coaches (stage 2), each compiled as a single jitted optimization step
scanned over the step axis.
"""
