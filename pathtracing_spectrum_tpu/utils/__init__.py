"""Host utilities: OBJ/texture/temperature IO, scene files, paths."""
