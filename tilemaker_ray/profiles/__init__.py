"""Built-in full-scale profiles (the reference ships these as Lua
scripts under resources/; here they are plain-Python profile classes
pluggable into pipelines.osm.osm_feature_dataset)."""
