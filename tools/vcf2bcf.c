/* Minimal VCF -> BCF converter for golden fixtures (links the
   reference's vendored htslib objects). Usage: vcf2bcf in.vcf out.bcf */
#include "htslib/vcf.h"
#include <stdio.h>
int main(int argc, char **argv) {
    if (argc != 3) { fprintf(stderr, "usage: %s in.vcf out.bcf\n", argv[0]); return 2; }
    htsFile *in = hts_open(argv[1], "r");
    if (!in) { perror("in"); return 1; }
    bcf_hdr_t *hdr = bcf_hdr_read(in);
    if (!hdr) { fprintf(stderr, "no header\n"); return 1; }
    htsFile *out = hts_open(argv[2], "wb");
    if (!out) { perror("out"); return 1; }
    if (bcf_hdr_write(out, hdr) != 0) return 1;
    bcf1_t *rec = bcf_init();
    while (bcf_read(in, hdr, rec) == 0)
        if (bcf_write(out, hdr, rec) != 0) return 1;
    bcf_destroy(rec);
    bcf_hdr_destroy(hdr);
    hts_close(out);
    hts_close(in);
    return 0;
}
