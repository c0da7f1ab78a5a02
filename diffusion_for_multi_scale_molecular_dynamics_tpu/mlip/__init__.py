"""Legacy MLIP wrappers: MTP (MLIP-3) and ACE (pacemaker) subprocess protocols."""
