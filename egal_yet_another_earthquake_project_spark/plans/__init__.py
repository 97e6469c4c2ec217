"""Physical-plan inspection utilities — scale properties as testable facts."""
