"""Device compute kernels: stencils, smoothers, block solves, transfers."""
