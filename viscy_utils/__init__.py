"""Import-compat alias for the reference package (viscy_tpu.compat)."""
from viscy_tpu.compat import alias_self

alias_self(__name__)
