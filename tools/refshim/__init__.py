# tools/refshim is NOT a package: it is a sys.path root providing minimal
# stand-ins for the reference's external dependencies (noctiluca, rouse,
# bayesmsd) so that /root/reference/bild can run unmodified on this host for
# behavioral comparisons. See tools/ref_compare_ggm.py for usage.
