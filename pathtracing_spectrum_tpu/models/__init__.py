"""Scene models: materials, camera, transforms, geometry."""
