from .kalman import msrouse_logL_batch, msrouse_logL_single  # noqa: F401
from .kalman_pallas import msrouse_logL_pallas  # noqa: F401
from .kalman_sym import msrouse_logL_pallas_sym  # noqa: F401
