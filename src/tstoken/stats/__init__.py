"""Pure-NumPy statistical kernels (no Spark imports; unit-testable alone).

These reimplement, from their published algorithms, the statistical routines
that the reference (aseemanand/pycatcher) imports from statsmodels / scipy /
PyOD / sesd — none of which are installable in this sandbox. Numeric
semantics follow the reference call sites cited in SURVEY.md §2.9.
"""

from .dispersion import zscore, mad_scores, mad_labels, iqr_fences
from .acf import acf, ssacf
from .boxcox import boxcox, inv_boxcox
from .normality import shapiro_w, shapiro, monte_carlo_shapiro_pvalue
from .decompose import seasonal_decompose
from .stl import stl_fit
from .mstl import mstl_fit
from .esd import generalized_esd, seasonal_esd

__all__ = [
    "zscore", "mad_scores", "mad_labels", "iqr_fences",
    "acf", "ssacf", "boxcox", "inv_boxcox",
    "shapiro_w", "shapiro", "monte_carlo_shapiro_pvalue",
    "seasonal_decompose", "stl_fit", "mstl_fit",
    "generalized_esd", "seasonal_esd",
]
