from .initializers import glorot_normal, glorot_uniform, he_normal, he_uniform, calc_fan
from .numerics import (
    binary_cross_entropy,
    compute_hidden_units_s1,
    compute_hidden_units_s2,
    count_parameters,
    l2_loss,
    mean_squared_error,
    split_train_test,
)

__all__ = [
    "glorot_normal",
    "glorot_uniform",
    "he_normal",
    "he_uniform",
    "calc_fan",
    "binary_cross_entropy",
    "compute_hidden_units_s1",
    "compute_hidden_units_s2",
    "count_parameters",
    "l2_loss",
    "mean_squared_error",
    "split_train_test",
]
