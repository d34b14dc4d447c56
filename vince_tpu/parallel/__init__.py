from vince_tpu.parallel.mesh import MeshSpec, make_mesh  # noqa: F401
