"""Physical-plan auditing: assert the plans we ship are the plans we want."""
