"""TPU compute path: lattice math, color ops, vertex pipeline, rasterizers."""
