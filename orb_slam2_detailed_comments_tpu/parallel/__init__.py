from .distributed_ba import distributed_global_ba, make_ba_mesh
