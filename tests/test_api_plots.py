"""Mirror of the reference's own plot-endpoint suite
(`reference/tests/test_api_diagnostics.py`): POST the same 7-row daily
series to every active endpoint and expect 200 + a decodable
`plot_image` PNG.

Parity notes:
  - the reference's seasonal endpoints return 200 for this
    under-the-gate input because `generate_plot_response` calls
    plt.savefig unconditionally — an empty/stale canvas ships as the
    image. Our endpoint layer reproduces the observable contract
    (200 + blank PNG) without matplotlib's cross-request figure leak.
  - the reference suite COMMENTS OUT `/build_outliers_plot_classic`
    and `/build_outliers_plot_moving_average` (they error on inputs
    this short there too); we mirror the suite as it ships, and pin
    our endpoints' behavior for those two separately below.
"""

import base64

import pytest

from tstoken.api import ApiError, HANDLERS
from tstoken.plotting import png_decode_size

SAMPLE = {
    "data": [["2023-01-01", 100], ["2023-01-02", 200],
             ["2023-01-03", 300], ["2023-01-04", 400],
             ["2023-01-05", 500], ["2023-01-06", 600],
             ["2023-01-07", 700]],
    "columns": ["date", "value"],
}

ACTIVE_ENDPOINTS = [
    "/build_iqr_plot",
    "/build_seasonal_plot_classic",
    "/build_seasonal_plot_stl",
    "/build_seasonal_plot_mstl",
    "/build_outliers_plot_mstl",
    "/build_outliers_plot_stl",
    "/build_outliers_plot_esd",
]


@pytest.mark.parametrize("endpoint", ACTIVE_ENDPOINTS)
def test_reference_suite_endpoint(endpoint):
    out = HANDLERS[endpoint](SAMPLE["data"], SAMPLE["columns"])
    assert "plot_image" in out, f"{endpoint} did not return plot_image"
    raw = base64.b64decode(out["plot_image"])
    w, h = png_decode_size(raw)
    assert w > 0 and h > 0


def test_disabled_reference_endpoints_fail_loudly():
    """The two endpoints the reference suite comments out error on
    short inputs there (decomposition/window search needs more rows);
    ours surface that as an ApiError 500 instead of a silent hang."""
    for endpoint in ("/build_outliers_plot_classic",
                     "/build_outliers_plot_moving_average"):
        try:
            out = HANDLERS[endpoint](SAMPLE["data"], SAMPLE["columns"])
        except ApiError as e:
            assert e.status_code == 500
        else:
            # if the endpoint can handle 7 rows, it must still return
            # a valid image (moving-average may, depending on window)
            raw = base64.b64decode(out["plot_image"])
            assert png_decode_size(raw)[0] > 0
