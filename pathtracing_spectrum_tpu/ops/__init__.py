"""Device-side compute ops: Planck spectra, intersection, BVH, sampling."""
