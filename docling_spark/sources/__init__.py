"""Sources: corpus synthesis and the snapshot/manifest lake."""
