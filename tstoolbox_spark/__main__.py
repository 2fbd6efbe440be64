"""``python -m tstoolbox_spark`` — see cli.py."""

from .cli import main

main()
