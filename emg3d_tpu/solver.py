"""Multigrid solver (placeholder; implemented in the next milestone)."""


def solve(*args, **kwargs):
    raise NotImplementedError("solver.solve coming in the next milestone")
