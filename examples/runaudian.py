"""Example launcher (the reference ships `runaudian.py:1-10` with the same
shape): open a recording with a 1-10 kHz band-pass preset."""

from audian_tpu.cli.audian import main

main(["-f", "1000", "-l", "15000", "data/recording.wav"])
