"""Global numeric constants shared across the framework.

These mirror the reference application's conventions so that renders are
comparable bit-for-formula (reference: PathTracing/src/mesh.h:12-13,
PathTracing/src/main.cpp:77).
"""

# Geometric epsilon used for ray-offsetting and degenerate-AABB fixes
# (reference: mesh.h:12).
EPS = 1e-3

# "Infinity" used to initialise AABBs (reference: mesh.h:13 — 0xFFFF).
INF = 65535.0

# Scene-file format version string (reference: main.cpp:77). The .pts
# reader/writer gates on this exact string.
SCENE_FILE_VERSION = "Spectrum 1.2.0"

# Header line of the .pts scene file (reference: main.cpp:833).
SCENE_FILE_HEADER = "Path Tracer Scene File"

# Framework version (independent of the scene-format version above).
__version__ = "0.1.0"
