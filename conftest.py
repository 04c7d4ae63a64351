# repo-root conftest so `python -m pytest tests/` finds the package
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
