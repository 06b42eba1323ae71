"""Flask upload surface over the tstoken.compat detectors.

Behavioral mirror of the reference's web flow (upload a CSV whose
first column is the date and last column the count, pick a detector,
get a JSON result with an HTML flag table + summary; reference
`src/pycatcher/webapp.py:28-202`, `__init__.py:167-205`). The module
is deliberately NOT a structural copy: the flow is plain functions
(no validator/analyzer class skeleton), the flag table is rendered by
our own small HTML generator with its own styling, and two behavior
deviations are documented:

  - the 'comprehensive' method returns a REAL rendered box plot (a
    base64 PNG data URI from tstoken.plots — drawn by our own
    rasterizer, not matplotlib) plus the IQR flag count;
  - no bundled HTML templates → `/` serves a minimal inline upload
    form and `/upload` always answers JSON (the reference does the
    same for AJAX/TESTING requests, which is what its test suite
    exercises);
  - uploads are saved under a sanitized filename (the reference joins
    the user-controlled name unsanitized, allowing ../-traversal — a
    bug not worth mirroring).
"""

from __future__ import annotations

import html
import os
from pathlib import Path
from typing import Any

import pandas as pd

try:
    from flask import Flask, jsonify, request
    HAVE_FLASK = True
except ImportError:  # pragma: no cover - flask is present in sandbox
    HAVE_FLASK = False

from . import compat

_INDEX_HTML = """<!doctype html>
<title>tstoken outlier analysis</title>
<h1>Upload a CSV (first column date, last column count)</h1>
<form method=post action=/upload enctype=multipart/form-data>
  <input type=file name=file>
  <select name=method>
    <option value=comprehensive>comprehensive</option>
    <option value=stl>stl</option>
    <option value=moving_average>moving average</option>
  </select>
  <input type=submit value=Analyze>
</form>"""

# own look for the flag table — scoped under one class so embedding
# pages aren't restyled
_TABLE_CSS = (
    "<style>"
    "table.ts-flags{border-collapse:collapse;font:14px sans-serif}"
    "table.ts-flags th{background:#15505a;color:#f4f9f9;"
    "padding:6px 12px;border:1px solid #9bb8bc}"
    "table.ts-flags td{padding:6px 12px;border:1px solid #c6d8da;"
    "text-align:right}"
    "table.ts-flags tr:nth-child(even) td{background:#eef5f5}"
    "</style>")


def _fmt_cell(v: Any) -> str:
    if isinstance(v, float):
        return f"{v:.2f}"
    return html.escape(str(v))


def render_flag_table(flags: pd.DataFrame) -> str:
    """Flagged rows as a self-contained HTML table (numbers at 2
    decimals, values escaped). Replaces the reference's pandas-Styler
    output; only 'an HTML table of the flagged rows' is contract."""
    head = "".join(f"<th>{html.escape(str(c))}</th>"
                   for c in flags.columns)
    body = "".join(
        "<tr>" + "".join(f"<td>{_fmt_cell(v)}</td>" for v in row)
        + "</tr>"
        for row in flags.itertuples(index=False))
    return (f"{_TABLE_CSS}<table class=\"ts-flags\">"
            f"<thead><tr>{head}</tr></thead>"
            f"<tbody>{body}</tbody></table>")


def extension_allowed(filename: str, allowed: set[str] | list[str]) -> bool:
    # rsplit, not Path().suffix: the reference's is_allowed_file
    # accepts dot-leading names like '.csv' (suffix would call that a
    # hidden file with no extension and reject it — a parity break)
    if "." not in filename:
        return False
    ext = filename.rsplit(".", 1)[1].lower()
    return bool(ext) and ext in {e.lower() for e in allowed}


def _summary(df: pd.DataFrame, n_out: int) -> dict[str, Any]:
    pct = (n_out / len(df) * 100) if len(df) else 0
    return {"total_rows": len(df), "outlier_rows": n_out,
            "outlier_percentage": round(pct, 2),
            "columns_analyzed": list(df.columns)}


def analyze_upload(file, upload_folder: str,
                   method: str = "comprehensive") -> dict[str, Any]:
    """Save the upload, run the chosen detector, shape the JSON reply.

    Response contract (mirrors the reference analyzer's dicts):
    {success, message, data: {table, summary{total_rows, outlier_rows,
    outlier_percentage, columns_analyzed}, plot}}.
    """
    try:
        from werkzeug.utils import secure_filename
        fname = secure_filename(file.filename) or "upload.csv"
        dest = Path(upload_folder) / fname
        file.save(str(dest))
        df = pd.read_csv(dest)

        plot_data = None
        if method == "comprehensive":
            flagged = compat.detect_outliers_classic(df)
            # a REAL rendered box plot (tstoken.plots rasterizer) plus
            # the flag count the old data-half reply carried
            from .plots import build_iqr_plot
            iqr_rows = compat.detect_outliers_iqr(df)
            plot_data = {"kind": "iqr",
                         "image": build_iqr_plot(df),
                         "n_flagged": int(len(iqr_rows))
                         if isinstance(iqr_rows, pd.DataFrame) else 0}
        elif method == "stl":
            flagged = compat.detect_outliers_stl(df)
        elif method == "moving_average":
            flagged = compat.detect_outliers_moving_average(df)
        else:
            raise ValueError("Invalid analysis method selected.")

        if not isinstance(flagged, pd.DataFrame):
            # detectors return a sentinel string when nothing is
            # flagged — surface it as an empty result, not an error
            return {"success": True,
                    "message": "Analysis completed successfully",
                    "data": {"table": "No outliers found",
                             "summary": _summary(df, 0),
                             "plot": None}}

        return {"success": True,
                "message": "Analysis completed successfully",
                "data": {"table": render_flag_table(flagged.reset_index()),
                         "summary": _summary(df, len(flagged)),
                         "plot": plot_data}}
    except Exception as e:
        return {"success": False,
                "message": f"Error processing file: {str(e)}",
                "data": None}


def create_app(test_config: dict | None = None):
    """App factory mirroring the reference's create_app defaults."""
    if not HAVE_FLASK:  # pragma: no cover
        raise ImportError("flask is not installed")
    app = Flask(__name__)
    if test_config is None:
        app.config.from_mapping(
            SECRET_KEY=os.getenv("SECRET_KEY", "default_secret_key"),
            UPLOAD_FOLDER=os.getenv("UPLOAD_FOLDER", "./uploads"),
            ALLOWED_EXTENSIONS={"csv"},
            MAX_CONTENT_LENGTH=16 * 1024 * 1024,
        )
    else:
        app.config.update(test_config)
    Path(app.config["UPLOAD_FOLDER"]).mkdir(parents=True, exist_ok=True)
    return app


def register_routes(app) -> None:
    """/ = inline upload form; /upload = JSON analysis (the AJAX and
    TESTING path the reference's own suite exercises)."""

    @app.route("/")
    def index():
        return _INDEX_HTML

    @app.route("/upload", methods=["POST"])
    def upload_file():
        file = request.files.get("file")
        if file is None or not file.filename:
            return jsonify({"success": False,
                            "message": "No file selected", "data": {}})
        if not extension_allowed(file.filename,
                                 app.config["ALLOWED_EXTENSIONS"]):
            return jsonify({
                "success": False,
                "message": "Invalid file type. Please upload a CSV file."})
        method = request.form.get("method", "comprehensive")
        return jsonify(analyze_upload(
            file, app.config["UPLOAD_FOLDER"], method))


def main() -> None:  # pragma: no cover - manual entry point
    app = create_app()
    register_routes(app)
    app.run(debug=True)
