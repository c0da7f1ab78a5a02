"""Data pipeline: LAMMPS parsing/ETL, datamodules, on-device MD generation."""
