from .ivf import IVFIndex, assign_cells, build_ivf_index, ivf_search  # noqa: F401
