from .initializer import initialize_two_view, TwoViewResult
