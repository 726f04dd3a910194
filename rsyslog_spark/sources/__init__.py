"""Input sources. The reference's input modules (plugins/im*) attach
fromhost / inputname / reception time and feed one queue; here every
source materializes the canonical transcript DataFrame."""
