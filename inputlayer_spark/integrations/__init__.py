"""Optional framework integrations (reference SDK
packages/inputlayer-py/src/inputlayer/integrations/)."""
