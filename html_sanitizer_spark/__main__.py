"""CLI batch driver — the reference's ``python -m html_sanitizer`` analog
(__main__.py:6-13): sanitize files or stdin through the engine, one
fragment per file. Pure local (no Spark); the distributed driver is
``python -m html_sanitizer_spark.pipeline.cli``.
"""

from __future__ import annotations

import sys

from .engine.core import sanitize
from .engine.settings import get_settings


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    config = "default"
    if args[:1] == ["--config"]:
        config = args[1]
        args = args[2:]
    settings = get_settings(config)
    if args:
        for filename in args:
            with open(filename, encoding="utf-8") as fh:
                print(sanitize(fh.read(), settings))
    else:
        print(sanitize(sys.stdin.read(), settings))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
