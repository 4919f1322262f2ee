from .slam_step import mono_tracking_step, example_tracking_args
