// Same p*q=r circuit as every other binding smoke test.
const za2 = require('./index.js');
const fs = require('fs');

fs.writeFileSync('/tmp/za2js_circuit.za', `
template Factor() {
  signal private input p;
  signal private input q;
  signal input r;
  p * q === r;
}
component main = Factor();
`);

za2.verbose(false);
const verifier = za2.setupSync('/tmp/za2js_circuit.za', '/tmp/za2js_pk', 'json');
const proof = za2.proveSync('/tmp/za2js_pk', '{"p":"2","q":"3","r":"6"}');
if (!za2.verifySync(verifier, proof)) throw new Error('verify failed');
const bad = proof.replace('"6"', '"7"');
if (za2.verifySync(verifier, bad)) throw new Error('tampered proof accepted');
console.log('ALL JS BINDING TESTS PASS');
